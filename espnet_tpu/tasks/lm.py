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
from espnet_tpu.models.lm import SequentialRNNLM, TransformerLM, lm_nll
from espnet_tpu.models.asr.espnet_model import add_sos_eos
from espnet_tpu.utils.dynamic_import import resolve_class
from espnet_tpu.utils.config import load_yaml, save_yaml

LMS = {"seq_rnn": SequentialRNNLM, "transformer": TransformerLM}

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
