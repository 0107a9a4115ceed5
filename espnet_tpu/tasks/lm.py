"""LM task (reference: espnet2/tasks/lm.py, espnet2/lm/espnet_model.py:14).

Wraps an LM (SequentialRNNLM / TransformerLM) with sos/eos handling and
masked NLL; provides train + perplexity computation.
"""
from __future__ import annotations

import math
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.parallel.distributed import init_distributed_and_mesh
from espnet_tpu.models.lm import ScannedTransformerLM, SequentialRNNLM, TransformerLM, lm_nll
from espnet_tpu.models.asr.espnet_model import add_sos_eos
from espnet_tpu.utils.dynamic_import import resolve_class
from espnet_tpu.utils.config import load_yaml, save_yaml

LMS = {
    "seq_rnn": SequentialRNNLM,
    "transformer": TransformerLM,
    # scan-over-layers variant: compiled program size constant in depth
    "transformer_scan": ScannedTransformerLM,
}

DEFAULT_CONFIG: Dict[str, Any] = {
    "token_list": None,
    "lm": "transformer",
    "lm_conf": {},
    "optim": "adam",
    "optim_conf": {"lr": 1e-3},
    "grad_clip": 5.0,
    "max_epoch": 10,
    "batch_size": 32,
    "seed": 0,
    "token_type": "char",
    "bpemodel": None,
    "log_interval": 100,
    "keep_nbest": 5,
}


class LMTaskModel(nn.Module):
    """(text, text_lengths) → masked NLL loss + ppl stats."""

    lm: nn.Module
    vocab_size: int
    ignore_id: int = -1

    def __call__(self, text, text_lengths, deterministic: bool = True):
        sos = eos = self.vocab_size - 1
        ys_in, ys_out = add_sos_eos(text, text_lengths, sos, eos, self.ignore_id)
        if isinstance(self.lm, SequentialRNNLM):
            logits = self.lm(ys_in, deterministic=deterministic)
        else:
            logits = self.lm(ys_in, text_lengths + 1, deterministic=deterministic)
        tgt = jnp.where(ys_out == self.ignore_id, 0, ys_out)
        nll, ntok = lm_nll(logits, tgt, text_lengths + 1)
        loss = nll / jnp.maximum(ntok, 1)
        return loss, {"loss": loss, "nll": nll, "ntokens": ntok}


def build_lm(config: Dict[str, Any], vocab: int):
    lm_cls = resolve_class(config.get("lm", "transformer"), LMS)
    lm = lm_cls(vocab, **config.get("lm_conf", {}))
    return LMTaskModel(lm=lm, vocab_size=vocab)


def train(
    config: Dict[str, Any],
    train_data,
    valid_data,
    expdir: str,
):
    from espnet_tpu.tasks.asr import build_preprocessor, build_tx
    from espnet_tpu.data.dataset import ESPnetDataset, SequenceIterFactory
    from espnet_tpu.train.trainer import Trainer

    token_list = config["token_list"]
    if isinstance(token_list, (str, Path)):
        token_list = [t for t in Path(token_list).read_text().splitlines() if t]
    vocab = len(token_list)
    model = build_lm(config, vocab)
    tx = build_tx(config)
    pre = build_preprocessor(config, token_list)
    train_ds = ESPnetDataset(train_data, preprocessor=pre)
    valid_ds = ESPnetDataset(valid_data, preprocessor=pre)
    shapes = {uid: train_ds[uid]["text"].shape for uid in train_ds.keys}
    vshapes = {uid: valid_ds[uid]["text"].shape for uid in valid_ds.keys}
    train_iter = SequenceIterFactory(
        train_ds, shapes, batch_size=config.get("batch_size", 32),
        seed=config.get("seed", 0),
    )
    valid_iter = SequenceIterFactory(
        valid_ds, vshapes, batch_size=config.get("batch_size", 32), shuffle=False
    )
    trainer = Trainer(
        model, tx, expdir=expdir,
        max_epoch=config.get("max_epoch", 10),
        keep_nbest=config.get("keep_nbest", 5),
        log_interval=config.get("log_interval", 100),
        mesh=init_distributed_and_mesh(config),
    )
    first = next(iter(train_iter(1)))
    variables = model.init(
        jax.random.PRNGKey(config.get("seed", 0)),
        first["text"], first["text_lengths"],
    )
    from espnet_tpu.train.init_params import apply_param_init

    variables = apply_param_init(variables, config)
    save_yaml(Path(expdir) / "config.yaml", {**config, "token_list": token_list})
    state = trainer.init_state(variables, seed=config.get("seed", 0))
    state = trainer.resume(state)
    state = trainer.run(state, train_iter, valid_iter)
    trainer.average_best_params(state)
    return trainer


def _concat_stream(ds, vocab: int, rng: np.random.RandomState) -> np.ndarray:
    """Concatenate all sentences into one token stream with <eos>
    separators (PTB/BPTT convention; reference chainer-backend BPTT LM).
    The leading <eos> doubles as the first <sos> context."""
    eos = vocab - 1
    keys = list(ds.keys)
    rng.shuffle(keys)
    parts = [np.array([eos], np.int32)]
    for k in keys:
        toks = np.asarray(ds[k]["text"], np.int32)
        parts.append(np.concatenate([toks, [eos]]).astype(np.int32))
    return np.concatenate(parts)


def train_bptt(
    config: Dict[str, Any],
    train_data,
    valid_data,
    expdir: str,
):
    """Truncated-BPTT LM training over the concatenated corpus stream
    (reference: espnet/lm/pytorch_backend/lm.py:89 BPTTUpdater /
    chainer ParallelSequentialIterator): the corpus is one long token
    stream split into batch lanes; hidden state carries across
    consecutive bptt_len windows within an epoch (gradients truncated
    at window boundaries). RNN LMs only (state is what carries)."""
    import optax

    from espnet_tpu.tasks.asr import build_preprocessor, build_tx
    from espnet_tpu.data.dataset import ESPnetDataset, SequenceIterFactory
    from espnet_tpu.models.lm import lm_nll
    from espnet_tpu.train.checkpoint import (
        save_checkpoint,
        save_epoch_params,
        update_best_symlink,
    )
    from espnet_tpu.train.reporter import Reporter

    token_list = config["token_list"]
    if isinstance(token_list, (str, Path)):
        token_list = [t for t in Path(token_list).read_text().splitlines() if t]
    vocab = len(token_list)
    if config.get("lm", "transformer") != "seq_rnn":
        raise ValueError("train_mode=bptt requires lm: seq_rnn (stateful)")
    lm = resolve_class("seq_rnn", LMS)(vocab, **config.get("lm_conf", {}))
    task_model = LMTaskModel(lm=lm, vocab_size=vocab)  # sentence-level eval
    tx = build_tx(config)
    pre = build_preprocessor(config, token_list)
    train_ds = ESPnetDataset(train_data, preprocessor=pre)
    valid_ds = ESPnetDataset(valid_data, preprocessor=pre)

    b = int(config.get("batch_size", 32))
    bptt = int(config.get("bptt_len", 64))
    seed = int(config.get("seed", 0))

    params = lm.init(
        jax.random.PRNGKey(seed), np.zeros((b, bptt), np.int32)
    )["params"]
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, carry, x, t, key):
        def loss_fn(p):
            new_carry, logits = lm.apply(
                {"params": p}, carry, x,
                method="forward_carry", rngs={"dropout": key},
            )
            nll, ntok = lm_nll(
                logits, t, jnp.full((x.shape[0],), x.shape[1], jnp.int32)
            )
            return nll / jnp.maximum(ntok, 1), new_carry

        (loss, new_carry), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, new_carry, loss

    reporter = Reporter()
    expdir = Path(expdir)
    expdir.mkdir(parents=True, exist_ok=True)
    save_yaml(expdir / "config.yaml", {**config, "token_list": token_list})
    vshapes = {uid: valid_ds[uid]["text"].shape for uid in valid_ds.keys}
    valid_iter = SequenceIterFactory(
        valid_ds, vshapes, batch_size=b, shuffle=False
    )
    vars_of = lambda p: {"params": {"lm": p}}  # noqa: E731

    import logging

    logger = logging.getLogger(__name__)
    max_epoch = int(config.get("max_epoch", 10))
    key = jax.random.PRNGKey(seed + 1)
    for epoch in range(1, max_epoch + 1):
        stream = _concat_stream(
            train_ds, vocab, np.random.RandomState(seed + epoch)
        )
        k = (len(stream) - 1) // b
        lanes = stream[: b * k + 1]
        xs = lanes[:-1][: b * k].reshape(b, k)
        ts = lanes[1:][: b * k].reshape(b, k)
        carry = lm.init_carry(b)
        sub = reporter.start_epoch("train", epoch)
        for w in range(0, k - 1, bptt):
            x = jnp.asarray(xs[:, w: w + bptt])
            t = jnp.asarray(ts[:, w: w + bptt])
            if x.shape[1] < bptt:  # static shapes: drop the ragged tail
                break
            key, sk = jax.random.split(key)
            params, opt_state, carry, loss = step(
                params, opt_state, carry, x, t, sk
            )
            sub.register({"loss": float(loss)}, weight=x.size)
        reporter.finish_epoch(sub)

        vsub = reporter.start_epoch("valid", epoch)
        ppl = calc_perplexity(task_model, vars_of(params), valid_iter(epoch))
        vsub.register({"loss": float(np.log(ppl)), "ppl": float(ppl)})
        reporter.finish_epoch(vsub)
        logger.info(
            "bptt epoch %d: train loss %.3f, valid ppl %.2f",
            epoch, reporter.get(epoch, "train", "loss"), ppl,
        )
        save_epoch_params(expdir, epoch, {"lm": params})
        save_checkpoint(
            expdir / "checkpoint.ckpt",
            {"params": {"lm": params}},
            meta={"epoch": epoch, "reporter": reporter.state_dict()},
        )
        if reporter.best_epoch("valid", "loss") == epoch:
            update_best_symlink(expdir, epoch, "valid.loss.best")
    reporter.save_json(expdir / "report.json")
    return reporter


def build_model_from_file(config_file, ckpt_file):
    config = load_yaml(config_file)
    token_list = config["token_list"]
    vocab = len(token_list)
    model = build_lm(config, vocab)
    ys = np.array([[1, 2]], dtype=np.int32)
    ylens = np.array([2], dtype=np.int32)
    variables = model.init(jax.random.PRNGKey(0), ys, ylens)
    from espnet_tpu.train.checkpoint import load_checkpoint

    target = jax.tree_util.tree_map(np.asarray, variables["params"])
    params = load_checkpoint(ckpt_file, target)
    # inner lm + its params (for fusion scorers)
    inner_vars = {"params": params["lm"]}
    return model.lm, inner_vars, token_list


def calc_perplexity(model, variables, data_iter) -> float:
    """Corpus perplexity (reference: bin/lm_calc_perplexity.py)."""
    total_nll = 0.0
    total_tok = 0.0
    apply = jax.jit(
        lambda v, text, lens: model.apply(v, text, lens)
    )
    for batch in data_iter:
        loss, stats = apply(variables, batch["text"], batch["text_lengths"])
        total_nll += float(stats["nll"])
        total_tok += float(stats["ntokens"])
    return math.exp(total_nll / max(total_tok, 1))
