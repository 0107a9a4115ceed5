"""ST / MT tasks (reference: espnet/st/pytorch_backend/st.py,
espnet/mt/pytorch_backend/mt.py re-imagined as config-driven tasks).

Data triplets: ST → wav.scp,speech,sound + text(tgt) + src_text;
MT → src_text + text. BLEU scoring is in utils/metrics.bleu.
"""
from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, List, Tuple

import jax
import numpy as np

from espnet_tpu.parallel.distributed import init_distributed_and_mesh
from espnet_tpu.models.st_mt import MTModel, STModel
from espnet_tpu.utils.config import save_yaml

DEFAULT_CONFIG: Dict[str, Any] = {
    "token_list": None,       # target vocab
    "src_token_list": None,   # source vocab (MT / ST aux ASR)
    "encoder_conf": {},
    "decoder_conf": {},
    "model_conf": {},
    "optim": "adam",
    "optim_conf": {"lr": 1e-3},
    "grad_clip": 5.0,
    "max_epoch": 20,
    "batch_size": 16,
    "seed": 0,
    "token_type": "char",
    "log_interval": 100,
    "keep_nbest": 5,
}


def build_st_model(config: Dict[str, Any], vocab: int, src_vocab: int) -> STModel:
    from espnet_tpu.models.asr import (
        ConformerEncoder,
        TransformerDecoder,
        TransformerEncoder,
    )
    from espnet_tpu.models.asr.frontend import DefaultFrontend, UtteranceMVN

    # encoder: transformer (e2e_st_transformer.py) | conformer
    # (e2e_st_conformer.py:19)
    enc_cls = (
        ConformerEncoder
        if config.get("encoder", "transformer") == "conformer"
        else TransformerEncoder
    )
    enc = enc_cls(**config.get("encoder_conf", {}))
    dec = TransformerDecoder(vocab, **config.get("decoder_conf", {}))
    mc = dict(config.get("model_conf", {}))
    asr_dec = None
    if mc.get("mtlalpha", 0.5) < 1.0 and mc.get("asr_weight", 0.3) > 0:
        asr_dec = TransformerDecoder(src_vocab, **config.get("decoder_conf", {}))
    frontend = normalize = None
    if config.get("frontend", "default") == "default":
        frontend = DefaultFrontend(**config.get("frontend_conf", {}))
        if config.get("normalize", "utterance_mvn") == "utterance_mvn":
            normalize = UtteranceMVN()
    return STModel(
        vocab_size=vocab, src_vocab_size=src_vocab, encoder=enc, decoder=dec,
        asr_decoder=asr_dec, frontend=frontend, normalize=normalize, **mc,
    )


def build_mt_model(config: Dict[str, Any], vocab: int, src_vocab: int) -> MTModel:
    from espnet_tpu.models.asr import TransformerDecoder, TransformerEncoder

    enc_conf = dict(config.get("encoder_conf", {}))
    enc_conf.setdefault("input_layer", "embed")
    enc_conf["vocab_size"] = src_vocab
    enc = TransformerEncoder(**enc_conf)
    dec = TransformerDecoder(vocab, **config.get("decoder_conf", {}))
    return MTModel(
        vocab_size=vocab, encoder=enc, decoder=dec, **config.get("model_conf", {})
    )


def train(
    config: Dict[str, Any],
    train_data: List[Tuple[str, str, str]],
    valid_data: List[Tuple[str, str, str]],
    expdir: str,
    task: str = "st",
):
    from espnet_tpu.data.dataset import ESPnetDataset, SequenceIterFactory
    from espnet_tpu.tasks.asr import build_preprocessor, build_tx
    from espnet_tpu.text.tokenizers import TokenIDConverter, build_tokenizer
    from espnet_tpu.data.dataset import CommonPreprocessor
    from espnet_tpu.train.trainer import Trainer

    token_list = config["token_list"]
    if isinstance(token_list, (str, Path)):
        token_list = [t for t in Path(token_list).read_text().splitlines() if t]
    src_token_list = config.get("src_token_list") or token_list
    if isinstance(src_token_list, (str, Path)):
        src_token_list = [
            t for t in Path(src_token_list).read_text().splitlines() if t
        ]

    tok = build_tokenizer(config.get("token_type", "char"))
    pre = CommonPreprocessor(
        tok, TokenIDConverter(token_list), text_names=("text",)
    )
    src_pre = CommonPreprocessor(
        tok, TokenIDConverter(src_token_list), text_names=("src_text",)
    )

    def preprocessor(uid, data):
        return src_pre(uid, pre(uid, data))

    if task == "st":
        model = build_st_model(config, len(token_list), len(src_token_list))
        key_field = "speech"
    else:
        model = build_mt_model(config, len(token_list), len(src_token_list))
        key_field = "src_text"
    tx = build_tx(config)
    train_ds = ESPnetDataset(train_data, preprocessor=preprocessor)
    valid_ds = ESPnetDataset(valid_data, preprocessor=preprocessor)
    shapes = {uid: train_ds[uid][key_field].shape for uid in train_ds.keys}
    vshapes = {uid: valid_ds[uid][key_field].shape for uid in valid_ds.keys}
    train_iter = SequenceIterFactory(
        train_ds, shapes, batch_size=config.get("batch_size", 16),
        seed=config.get("seed", 0),
    )
    valid_iter = SequenceIterFactory(
        valid_ds, vshapes, batch_size=config.get("batch_size", 16), shuffle=False
    )
    trainer = Trainer(
        model, tx, expdir=expdir,
        max_epoch=config.get("max_epoch", 20),
        keep_nbest=config.get("keep_nbest", 5),
        log_interval=config.get("log_interval", 100),
        mesh=init_distributed_and_mesh(config),
    )
    first = next(iter(train_iter(1)))
    variables = model.init(jax.random.PRNGKey(config.get("seed", 0)), **first)
    from espnet_tpu.train.init_params import apply_param_init

    variables = apply_param_init(variables, config)
    save_yaml(
        Path(expdir) / "config.yaml",
        {**config, "token_list": token_list, "src_token_list": src_token_list,
         "task": task},
    )
    state = trainer.init_state(variables, seed=config.get("seed", 0))
    state = trainer.resume(state)
    state = trainer.run(state, train_iter, valid_iter)
    trainer.average_best_params(state)
    return trainer


def build_model_from_file(config_file, ckpt_file):
    """config.yaml + ckpt → (model, variables, token_list, src_token_list,
    task) for st_trans/mt_trans (reference analog: asr_init.load_trained_model)."""
    from espnet_tpu.utils.config import load_yaml

    config = load_yaml(config_file)
    token_list = config["token_list"]
    src_token_list = config.get("src_token_list") or token_list
    task = config.get("task", "st")
    if task == "st":
        model = build_st_model(config, len(token_list), len(src_token_list))
        if config.get("frontend", "default") == "default":
            n = config.get("frontend_conf", {}).get("n_fft", 512) * 8
            speech = np.zeros((1, n), dtype=np.float32)
            slen = np.array([n], dtype=np.int32)
        else:
            speech = np.zeros((1, 16, 80), dtype=np.float32)
            slen = np.array([16], dtype=np.int32)
        init_args = (speech, slen,
                     np.array([[1, 2]], dtype=np.int32),
                     np.array([2], dtype=np.int32))
    else:
        model = build_mt_model(config, len(token_list), len(src_token_list))
        init_args = (np.array([[1, 2, 3]], dtype=np.int32),
                     np.array([3], dtype=np.int32),
                     np.array([[1, 2]], dtype=np.int32),
                     np.array([2], dtype=np.int32))
    variables = model.init(jax.random.PRNGKey(0), *init_args)
    from espnet_tpu.train.checkpoint import load_checkpoint

    target = jax.tree_util.tree_map(np.asarray, variables["params"])
    params = load_checkpoint(ckpt_file, target)
    return model, {"params": params}, token_list, src_token_list, task
