"""Enhancement/separation task (reference: espnet2/tasks/enh.py):
config → separator (tf_masking | tasnet) → EnhancementModel, trained on
fixed-length chunks (ChunkIterFactory) with PIT SI-SNR.

Data triplets: speech_mix (mixture wav scp) + speech_ref1..N (reference
wav scps, stacked into (B, n_spk, L) by the chunk collate below).
"""
from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np

from espnet_tpu.parallel.distributed import init_distributed_and_mesh
from espnet_tpu.data.dataset import ChunkIterFactory, ESPnetDataset
from espnet_tpu.models.enh import EnhancementModel, TFMaskingNet
from espnet_tpu.models.enh.tasnet import ConvTasNet
from espnet_tpu.utils.dynamic_import import resolve_class
from espnet_tpu.utils.config import save_yaml

SEPARATORS = {"tf_masking": TFMaskingNet, "tasnet": ConvTasNet}

DEFAULT_CONFIG: Dict[str, Any] = {
    "separator": "tf_masking",
    "separator_conf": {},
    "n_spk": 2,
    "chunk_length": 16000,
    "optim": "adam",
    "optim_conf": {"lr": 1e-3},
    "grad_clip": 5.0,
    "max_epoch": 20,
    "batch_size": 8,
    "seed": 0,
    "log_interval": 100,
    "keep_nbest": 5,
}


def build_enh_model(config: Dict[str, Any]) -> EnhancementModel:
    n_spk = config.get("n_spk", 2)
    sep_cls = resolve_class(config.get("separator", "tf_masking"), SEPARATORS)
    sep = sep_cls(n_spk=n_spk, **config.get("separator_conf", {}))
    return EnhancementModel(separator=sep, n_spk=n_spk)


class _EnhChunkCollate:
    """Stack per-speaker refs into speech_ref (B, n_spk, L)."""

    def __init__(self, n_spk: int):
        self.n_spk = n_spk

    def __call__(self, batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        refs = [batch.pop(f"speech_ref{i+1}") for i in range(self.n_spk)]
        batch["speech_ref"] = np.stack(refs, axis=1)
        return batch


def train(
    config: Dict[str, Any],
    train_data: List[Tuple[str, str, str]],
    valid_data: List[Tuple[str, str, str]],
    expdir: str,
):
    from espnet_tpu.tasks.asr import build_tx
    from espnet_tpu.train.trainer import Trainer

    model = build_enh_model(config)
    tx = build_tx(config)
    n_spk = config.get("n_spk", 2)
    collate = _EnhChunkCollate(n_spk)

    def iter_factory(data):
        ds = ESPnetDataset(data)
        shapes = {uid: ds[uid]["speech_mix"].shape for uid in ds.keys}
        chunk = ChunkIterFactory(
            ds,
            shapes,
            chunk_length=config.get("chunk_length", 16000),
            batch_size=config.get("batch_size", 8),
            seed=config.get("seed", 0),
            speech_name="speech_mix",
        )

        def factory(epoch):
            for batch in chunk(epoch):
                yield collate(batch)

        return factory

    train_iter = iter_factory(train_data)
    valid_iter = iter_factory(valid_data)
    trainer = Trainer(
        model, tx, expdir=expdir,
        max_epoch=config.get("max_epoch", 20),
        keep_nbest=config.get("keep_nbest", 5),
        log_interval=config.get("log_interval", 100),
        best_key="loss",
        mesh=init_distributed_and_mesh(config),
    )
    first = next(iter(train_iter(1)))
    variables = model.init(
        jax.random.PRNGKey(config.get("seed", 0)),
        first["speech_mix"], first["speech_mix_lengths"], first["speech_ref"],
    )
    from espnet_tpu.train.init_params import apply_param_init

    variables = apply_param_init(variables, config)
    save_yaml(Path(expdir) / "config.yaml", config)
    state = trainer.init_state(variables, seed=config.get("seed", 0))
    state = trainer.resume(state)
    state = trainer.run(state, train_iter, valid_iter)
    trainer.average_best_params(state)
    return trainer


def build_model_from_file(config_file, ckpt_file):
    """config.yaml + ckpt → (model, variables, config) for enh_inference."""
    from espnet_tpu.utils.config import load_yaml

    config = load_yaml(config_file)
    model = build_enh_model(config)
    L = int(config.get("chunk_length", 16000))
    mix = np.zeros((1, L), dtype=np.float32)
    lens = np.array([L], dtype=np.int32)
    refs = np.zeros((1, config.get("n_spk", 2), L), dtype=np.float32)
    variables = model.init(jax.random.PRNGKey(0), mix, lens, refs)
    from espnet_tpu.train.checkpoint import load_checkpoint

    target = jax.tree_util.tree_map(np.asarray, variables["params"])
    params = load_checkpoint(ckpt_file, target)
    return model, {"params": params}, config
