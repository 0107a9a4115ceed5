"""Voice conversion task (reference: espnet/vc/pytorch_backend/vc.py —
parallel spectrogram→spectrogram Tacotron2 training, e2e_vc_tacotron2.py).

Data triplets: src_speech (source-speaker wav scp) + speech (target-
speaker wav scp), utterance-parallel. Both are converted to log-mel
in-graph; the target stream is normalized with persisted stats.
"""
from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.models.tts.vc_tacotron2 import VCTacotron2
from espnet_tpu.ops import log_mel_spectrogram
from espnet_tpu.parallel.distributed import init_distributed_and_mesh
from espnet_tpu.utils.config import load_yaml, save_yaml

DEFAULT_CONFIG: Dict[str, Any] = {
    "vc_model": "tacotron2",  # tacotron2 | transformer (VTN)
    "vc_conf": {},
    "feats_extract_conf": {"fs": 16000, "n_fft": 1024, "hop_length": 256,
                           "n_mels": 80, "fmin": 80.0, "fmax": 7600.0},
    "optim": "adam",
    "optim_conf": {"lr": 1e-3},
    "grad_clip": 1.0,
    "max_epoch": 20,
    "batch_size": 8,
    "seed": 0,
    "log_interval": 100,
    "keep_nbest": 5,
}


class VCTaskModel(nn.Module):
    """(src_speech wav, speech wav) → VC loss; feats in-graph."""

    vc: nn.Module
    feats_conf: Tuple[Tuple[str, Any], ...]
    n_mels: int = 80

    def setup(self):
        self.mean = self.variable(
            "norm_stats", "mean", lambda: jnp.zeros((self.n_mels,))
        )
        self.std = self.variable(
            "norm_stats", "std", lambda: jnp.ones((self.n_mels,))
        )

    def _feats(self, wav, lengths):
        feats, feat_lens = log_mel_spectrogram(wav, lengths, **dict(self.feats_conf))
        feats = (feats - self.mean.value) / jnp.maximum(self.std.value, 1e-10)
        return feats, feat_lens

    def __call__(
        self,
        src_speech: jnp.ndarray,
        src_speech_lengths: jnp.ndarray,
        speech: jnp.ndarray,
        speech_lengths: jnp.ndarray,
        deterministic: bool = True,
    ):
        src, src_lens = self._feats(src_speech, src_speech_lengths)
        tgt, tgt_lens = self._feats(speech, speech_lengths)
        # pad target frames to a reduction-factor multiple
        r = self.vc.reduction_factor
        t = tgt.shape[1]
        pad = (-t) % r
        if pad:
            tgt = jnp.pad(tgt, ((0, 0), (0, pad), (0, 0)))
        return self.vc(src, src_lens, tgt, tgt_lens, deterministic=deterministic)

    def convert(self, src_speech, src_speech_lengths, **kw):
        """wav → (denormalized converted log-mel, lengths)."""
        src, src_lens = self._feats(src_speech, src_speech_lengths)
        feats, olens, _ = self.vc.inference(src, src_lens, **kw)
        return feats * jnp.maximum(self.std.value, 1e-10) + self.mean.value, olens


def build_vc_model(config: Dict[str, Any]) -> VCTaskModel:
    fc = config.get("feats_extract_conf", {})
    n_mels = fc.get("n_mels", 80)
    # vc_model: tacotron2 (default, e2e_vc_tacotron2.py) |
    #           transformer (Voice Transformer Network, e2e_vc_transformer.py)
    kind = config.get("vc_model", "tacotron2")
    if kind == "transformer":
        from espnet_tpu.models.tts.vc_transformer import VCTransformer

        vc = VCTransformer(
            idim=n_mels, n_mels=n_mels, **config.get("vc_conf", {})
        )
    elif kind == "tacotron2":
        vc = VCTacotron2(idim=n_mels, n_mels=n_mels, **config.get("vc_conf", {}))
    else:
        raise ValueError(f"unknown vc_model {kind}")
    return VCTaskModel(
        vc=vc, feats_conf=tuple(sorted(fc.items())), n_mels=n_mels
    )


def build_model_from_file(config_file, ckpt_file):
    config = load_yaml(config_file)
    model = build_vc_model(config)
    hop = config.get("feats_extract_conf", {}).get("hop_length", 256)
    wav = np.zeros((1, hop * 8), dtype=np.float32)
    wl = np.array([hop * 8], dtype=np.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        wav, wl, wav, wl,
    )
    from espnet_tpu.train.checkpoint import load_checkpoint

    target = jax.tree_util.tree_map(np.asarray, variables["params"])
    params = load_checkpoint(ckpt_file, target)
    variables = {**variables, "params": params}
    stats_npz = Path(config_file).parent / "feats_stats.npz"
    if stats_npz.exists():
        d = np.load(stats_npz)
        mean = (d["sum"] / d["count"]).astype(np.float32)
        std = np.sqrt(
            np.maximum(d["sum_square"] / d["count"] - mean**2, 1e-20)
        ).astype(np.float32)
        variables["norm_stats"] = {"mean": mean, "std": std}
    return model, variables, config


def train(
    config: Dict[str, Any],
    train_data: List[Tuple[str, str, str]],
    valid_data: List[Tuple[str, str, str]],
    expdir: str,
    stats_dir: Optional[str] = None,
):
    from espnet_tpu.data.dataset import ESPnetDataset, SequenceIterFactory
    from espnet_tpu.tasks.asr import build_tx
    from espnet_tpu.train.trainer import Trainer

    model = build_vc_model(config)
    tx = build_tx(config)
    train_ds = ESPnetDataset(train_data)
    valid_ds = ESPnetDataset(valid_data)
    shapes = {uid: train_ds[uid]["src_speech"].shape for uid in train_ds.keys}
    vshapes = {uid: valid_ds[uid]["src_speech"].shape for uid in valid_ds.keys}
    train_iter = SequenceIterFactory(
        train_ds, shapes, batch_size=config.get("batch_size", 8),
        seed=config.get("seed", 0),
    )
    valid_iter = SequenceIterFactory(
        valid_ds, vshapes, batch_size=config.get("batch_size", 8), shuffle=False
    )
    trainer = Trainer(
        model, tx, expdir=expdir,
        max_epoch=config.get("max_epoch", 20),
        keep_nbest=config.get("keep_nbest", 5),
        log_interval=config.get("log_interval", 100),
        mesh=init_distributed_and_mesh(config),
    )
    first = next(iter(train_iter(1)))
    variables = model.init(
        {"params": jax.random.PRNGKey(config.get("seed", 0)),
         "dropout": jax.random.PRNGKey(1)},
        first["src_speech"], first["src_speech_lengths"],
        first["speech"], first["speech_lengths"],
    )
    from espnet_tpu.train.init_params import apply_param_init

    variables = apply_param_init(variables, config)
    # target-mel normalization stats from the training targets
    exp = Path(expdir)
    exp.mkdir(parents=True, exist_ok=True)
    stats_npz = (Path(stats_dir) / "feats_stats.npz") if stats_dir else None
    if stats_npz is not None and stats_npz.exists():
        d = np.load(stats_npz)
        mean = (d["sum"] / d["count"]).astype(np.float32)
        std = np.sqrt(
            np.maximum(d["sum_square"] / d["count"] - mean**2, 1e-20)
        ).astype(np.float32)
        variables = {**variables, "norm_stats": {"mean": mean, "std": std}}
        import shutil

        shutil.copy(stats_npz, exp / "feats_stats.npz")
    save_yaml(exp / "config.yaml", config)
    state = trainer.init_state(variables, seed=config.get("seed", 0))
    state = trainer.resume(state)
    state = trainer.run(state, train_iter, valid_iter)
    trainer.average_best_params(state)
    return trainer


def collect_stats(
    config: Dict[str, Any],
    data: List[Tuple[str, str, str]],
    output_dir: str,
):
    """Target log-mel stats (over the `speech` stream) + shape files."""
    from espnet_tpu.data.dataset import ESPnetDataset
    from espnet_tpu.tasks.asr import write_shape_file

    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    ds = ESPnetDataset(data)
    conf = config.get("feats_extract_conf", {})
    count = 0
    ssum = ssq = None
    shapes: Dict[str, Dict[str, Tuple[int, ...]]] = {}
    for uid in ds.keys:
        s = ds[uid]
        wav = s["speech"]
        feats, _ = log_mel_spectrogram(jnp.asarray(wav)[None], None, **conf)
        f = np.asarray(feats[0])
        if ssum is None:
            ssum = np.zeros(f.shape[-1])
            ssq = np.zeros(f.shape[-1])
        ssum += f.sum(0)
        ssq += (f**2).sum(0)
        count += f.shape[0]
        for name in ("src_speech", "speech"):
            if name in s:
                shapes.setdefault(name, {})[uid] = s[name].shape
    for name, shp in shapes.items():
        write_shape_file(out / f"{name}_shape", shp)
    np.savez(out / "feats_stats.npz", count=count, sum=ssum, sum_square=ssq)
