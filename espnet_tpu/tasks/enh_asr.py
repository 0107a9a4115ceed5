"""Joint enhancement + ASR task (reference: espnet2/tasks/enh_asr.py,
espnet2/asr/espnet_joint_model.py).

Config builds a separator (tf_masking | tasnet) + a raw-waveform ASR
model (frontend: default) and trains the EnhASRModel joint loss
(1-enh_weight)·asr + enh_weight·PIT-SI-SNR on whole utterances.

Data tuples: speech_mix (mixture scp) + speech_ref1..N (clean scps) +
text_spk1..N (per-speaker transcripts).
"""
from __future__ import annotations

import logging
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np

from espnet_tpu.data.dataset import (
    CommonPreprocessor,
    ESPnetDataset,
    SequenceIterFactory,
    common_collate,
)
from espnet_tpu.models.enh import TFMaskingNet
from espnet_tpu.models.enh.joint import EnhASRModel
from espnet_tpu.models.enh.tasnet import ConvTasNet
from espnet_tpu.parallel.distributed import init_distributed_and_mesh
from espnet_tpu.text.tokenizers import TokenIDConverter, build_tokenizer
from espnet_tpu.utils.config import save_yaml
from espnet_tpu.utils.dynamic_import import resolve_class

logger = logging.getLogger(__name__)

SEPARATORS = {"tf_masking": TFMaskingNet, "tasnet": ConvTasNet}

DEFAULT_CONFIG: Dict[str, Any] = {
    "separator": "tf_masking",
    "separator_conf": {},
    "n_spk": 2,
    "enh_weight": 0.5,
    "token_list": None,
    "token_type": "char",
    "frontend": "default",
    "frontend_conf": {},
    "encoder": "rnn",
    "encoder_conf": {},
    "decoder": None,
    "decoder_conf": {},
    "model_conf": {},
    "optim": "adam",
    "optim_conf": {"lr": 1e-3},
    "grad_clip": 5.0,
    "max_epoch": 15,
    "batch_size": 8,
    "seed": 0,
    "log_interval": 100,
    "keep_nbest": 5,
}


def build_joint_model(config: Dict[str, Any], vocab: int) -> EnhASRModel:
    from espnet_tpu.tasks.asr import build_model

    n_spk = config.get("n_spk", 2)
    sep_cls = resolve_class(config.get("separator", "tf_masking"), SEPARATORS)
    sep = sep_cls(n_spk=n_spk, **config.get("separator_conf", {}))
    asr_config = dict(config)
    asr_config.setdefault("frontend", "default")
    asr_config["model_type"] = "asr"
    asr = build_model(asr_config, vocab)
    return EnhASRModel(
        separator=sep, asr=asr, n_spk=n_spk,
        enh_weight=config.get("enh_weight", 0.5),
    )


def _make_collate(n_spk: int):
    def collate(samples):
        out = common_collate(samples)
        refs = [out.pop(f"speech_ref{i + 1}") for i in range(n_spk)]
        for i in range(n_spk):
            out.pop(f"speech_ref{i + 1}_lengths", None)
        n_max = max(r.shape[1] for r in refs)
        refs = [
            np.pad(r, ((0, 0), (0, n_max - r.shape[1]))) for r in refs
        ]
        out["speech_ref"] = np.stack(refs, axis=1)  # (B, n_spk, N)
        texts = [out.pop(f"text_spk{i + 1}") for i in range(n_spk)]
        lens = [out.pop(f"text_spk{i + 1}_lengths") for i in range(n_spk)]
        l_max = max(t.shape[1] for t in texts)
        texts = [
            np.pad(t, ((0, 0), (0, l_max - t.shape[1])), constant_values=-1)
            for t in texts
        ]
        out["text_ref"] = np.stack(texts, axis=1)  # (B, n_spk, U)
        out["text_ref_lengths"] = np.stack(lens, axis=1)  # (B, n_spk)
        return out

    return collate


def train(
    config: Dict[str, Any],
    train_data: List[Tuple[str, str, str]],
    valid_data: List[Tuple[str, str, str]],
    expdir: str,
):
    from espnet_tpu.tasks.asr import build_tx
    from espnet_tpu.train.init_params import apply_param_init
    from espnet_tpu.train.trainer import Trainer

    token_list = config["token_list"]
    if isinstance(token_list, (str, Path)):
        token_list = [t for t in Path(token_list).read_text().splitlines() if t]
    vocab = len(token_list)
    n_spk = config.get("n_spk", 2)
    model = build_joint_model(config, vocab)
    tx = build_tx(config)

    tokenizer = build_tokenizer(
        config.get("token_type", "char"), bpemodel=config.get("bpemodel"),
        g2p_type=config.get("g2p"),
    )
    pre = CommonPreprocessor(
        tokenizer, TokenIDConverter(token_list),
        text_names=tuple(f"text_spk{i + 1}" for i in range(n_spk)),
    )
    collate = _make_collate(n_spk)

    def make_iter(data, shuffle):
        ds = ESPnetDataset(data, preprocessor=pre)
        shapes = {}
        for uid in ds.keys:
            arr = ds[uid].get("speech_mix")
            shapes[uid] = arr.shape if arr is not None else (1,)
        return SequenceIterFactory(
            ds, shapes, batch_size=config.get("batch_size", 8),
            seed=config.get("seed", 0), shuffle=shuffle, collate=collate,
        )

    train_iter = make_iter(train_data, True)
    valid_iter = make_iter(valid_data, False)
    trainer = Trainer(
        model, tx, expdir=expdir,
        max_epoch=config.get("max_epoch", 15),
        keep_nbest=config.get("keep_nbest", 5),
        log_interval=config.get("log_interval", 100),
        best_key="loss",
        mesh=init_distributed_and_mesh(config),
    )
    first = next(iter(train_iter(1)))
    variables = model.init(
        jax.random.PRNGKey(config.get("seed", 0)),
        first["speech_mix"], first["speech_mix_lengths"],
        first["speech_ref"], first["text_ref"], first["text_ref_lengths"],
    )
    variables = apply_param_init(variables, config)
    cfg_out = dict(config)
    cfg_out["token_list"] = token_list
    save_yaml(Path(expdir) / "config.yaml", cfg_out)
    state = trainer.init_state(variables, seed=config.get("seed", 0))
    state = trainer.resume(state)
    state = trainer.run(state, train_iter, valid_iter)
    trainer.average_best_params(state)
    return trainer


def build_model_from_file(config_file, ckpt_file):
    """(config.yaml, ckpt) → (model, variables, token_list)."""
    from espnet_tpu.train.checkpoint import load_ckpt
    from espnet_tpu.utils.config import load_yaml

    config = load_yaml(config_file)
    token_list = config["token_list"]
    model = build_joint_model(config, len(token_list))
    n_spk = config.get("n_spk", 2)
    dummy_mix = np.zeros((1, 1600), dtype=np.float32)
    dummy_ref = np.zeros((1, n_spk, 1600), dtype=np.float32)
    dummy_text = np.zeros((1, n_spk, 2), dtype=np.int32)
    variables = model.init(
        jax.random.PRNGKey(0), dummy_mix, np.array([1600], np.int32),
        dummy_ref, dummy_text, np.full((1, n_spk), 2, np.int32),
    )
    variables = load_ckpt(ckpt_file, variables)
    return model, variables, token_list
