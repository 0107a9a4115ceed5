"""TTS task (reference: espnet2/tasks/tts.py, espnet2/tts/espnet_model.py:25).

TTSTaskModel = feats_extract (LogMelFbank on raw wav) → GlobalMVN →
tts model (Tacotron2 / Transformer-TTS / FastSpeech2). For FastSpeech2,
durations come from a teacher Tacotron2's attention
(durations_from_attention) prepared by the recipe; pitch/energy targets
from ops.pitch.
"""
from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from espnet_tpu.parallel.distributed import init_distributed_and_mesh
from espnet_tpu.models.tts import FastSpeech2, Tacotron2, TransformerTTS
from espnet_tpu.ops.stft import log_mel_spectrogram
from espnet_tpu.utils.dynamic_import import resolve_class
from espnet_tpu.utils.config import load_yaml, save_yaml

TTS_MODELS = {
    "tacotron2": Tacotron2,
    "transformer": TransformerTTS,
    "fastspeech2": FastSpeech2,
}

DEFAULT_CONFIG: Dict[str, Any] = {
    "token_list": None,
    "tts": "tacotron2",
    "tts_conf": {},
    "feats_extract_conf": {"fs": 16000, "n_fft": 1024, "hop_length": 256, "n_mels": 80,
                           "fmin": 80.0, "fmax": 7600.0},
    "optim": "adam",
    "optim_conf": {"lr": 1e-3},
    "grad_clip": 1.0,
    "max_epoch": 20,
    "batch_size": 16,
    "seed": 0,
    "token_type": "char",
    "log_interval": 100,
    "keep_nbest": 5,
}


class TTSTaskModel(nn.Module):
    """(text, text_lengths, speech[wav], speech_lengths) → TTS loss.

    Extracts log-mel targets from raw speech in-graph, normalizes with
    persisted stats, and delegates to the TTS module.
    """

    tts: nn.Module
    feats_conf: Tuple[Tuple[str, Any], ...]
    n_mels: int = 80

    def setup(self):
        self.mean = self.variable(
            "norm_stats", "mean", lambda: jnp.zeros((self.n_mels,))
        )
        self.std = self.variable(
            "norm_stats", "std", lambda: jnp.ones((self.n_mels,))
        )

    def __call__(
        self,
        text: jnp.ndarray,
        text_lengths: jnp.ndarray,
        speech: jnp.ndarray,
        speech_lengths: jnp.ndarray,
        durations: Optional[jnp.ndarray] = None,
        pitch: Optional[jnp.ndarray] = None,
        energy: Optional[jnp.ndarray] = None,
        durations_lengths=None,  # collate byproducts, unused
        pitch_lengths=None,
        energy_lengths=None,
        deterministic: bool = True,
    ):
        conf = dict(self.feats_conf)
        feats, feat_lens = log_mel_spectrogram(speech, speech_lengths, **conf)
        feats = (feats - self.mean.value) / jnp.maximum(self.std.value, 1e-10)
        # pad frames to a reduction-factor multiple (autoregressive TTS
        # groups r frames per decoder step)
        r = getattr(self.tts, "reduction_factor", 1)
        pad = (-feats.shape[1]) % r
        if pad:
            feats = jnp.pad(feats, ((0, 0), (0, pad), (0, 0)))
        kwargs = {}
        if isinstance(self.tts, FastSpeech2):
            kwargs = dict(durations=durations, pitch=pitch, energy=energy)
        return self.tts(
            text, text_lengths, feats, feat_lens, deterministic=deterministic, **kwargs
        )

    def teacher_alignment(
        self,
        text: jnp.ndarray,
        text_lengths: jnp.ndarray,
        speech: jnp.ndarray,
        speech_lengths: jnp.ndarray,
    ):
        """Teacher-forced attention → per-token durations (+ feat lens).

        For a trained Tacotron2 teacher; feeds FastSpeech(2) training
        (reference fastspeech/duration_calculator.py:16)."""
        from espnet_tpu.models.tts.fastspeech import durations_from_attention

        conf = dict(self.feats_conf)
        feats, feat_lens = log_mel_spectrogram(speech, speech_lengths, **conf)
        feats = (feats - self.mean.value) / jnp.maximum(self.std.value, 1e-10)
        enc_h = self.tts.enc(text, text_lengths, True)
        _, _, att_ws = self.tts._decode_teacher(enc_h, text_lengths, feats, True)
        dur = durations_from_attention(
            att_ws, text_lengths, feat_lens // self.tts.reduction_factor
        )
        # make durations sum exactly to feat_lens (pad/trim last token)
        deficit = feat_lens - dur.sum(axis=1)
        last = jnp.maximum(text_lengths - 1, 0)
        dur = dur.at[jnp.arange(dur.shape[0]), last].add(deficit)
        return jnp.maximum(dur, 0), feat_lens

    def synthesize(self, text, text_lengths, **kw):
        """→ (denormalized log-mel, lengths[, extras])."""
        out = self.tts.inference(text, text_lengths, **kw)
        feats, olens = out[0], out[1]
        return feats * jnp.maximum(self.std.value, 1e-10) + self.mean.value, olens


def build_tts_model(config: Dict[str, Any], vocab: int) -> TTSTaskModel:
    cls = resolve_class(config.get("tts", "tacotron2"), TTS_MODELS)
    n_mels = config.get("feats_extract_conf", {}).get("n_mels", 80)
    tts = cls(vocab_size=vocab, n_mels=n_mels, **config.get("tts_conf", {}))
    feats_conf = tuple(sorted(config.get("feats_extract_conf", {}).items()))
    return TTSTaskModel(tts=tts, feats_conf=feats_conf, n_mels=n_mels)


def build_model_from_file(config_file, ckpt_file):
    config = load_yaml(config_file)
    token_list = config["token_list"]
    model = build_tts_model(config, len(token_list))
    text = np.array([[1, 2]], dtype=np.int32)
    tl = np.array([2], dtype=np.int32)
    hop = config.get("feats_extract_conf", {}).get("hop_length", 256)
    wav = np.zeros((1, hop * 8), dtype=np.float32)
    wl = np.array([hop * 8], dtype=np.int32)
    kw = {}
    if config.get("tts") == "fastspeech2":
        kw = dict(
            durations=np.array([[4, 5]], dtype=np.int32),
            pitch=np.zeros((1, 2), dtype=np.float32),
            energy=np.zeros((1, 2), dtype=np.float32),
        )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        text, tl, wav, wl, **kw,
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
    return model, variables, token_list


def collect_stats(
    config: Dict[str, Any],
    data: List[Tuple[str, str, str]],
    output_dir: str,
    token_list: List[str],
):
    """Log-mel stats + shape files for TTS training."""
    from espnet_tpu.data.dataset import ESPnetDataset
    from espnet_tpu.tasks.asr import build_preprocessor, write_shape_file

    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    pre = build_preprocessor(config, token_list)
    ds = ESPnetDataset(data, preprocessor=pre)
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
        shapes.setdefault("speech", {})[uid] = wav.shape
        shapes.setdefault("text", {})[uid] = s["text"].shape
    for name, shp in shapes.items():
        write_shape_file(out / f"{name}_shape", shp)
    np.savez(out / "feats_stats.npz", count=count, sum=ssum, sum_square=ssq)


def train(
    config: Dict[str, Any],
    train_data: List[Tuple[str, str, str]],
    valid_data: List[Tuple[str, str, str]],
    expdir: str,
    stats_dir: Optional[str] = None,
):
    from espnet_tpu.data.dataset import ESPnetDataset, SequenceIterFactory
    from espnet_tpu.tasks.asr import build_preprocessor, build_tx
    from espnet_tpu.train.trainer import Trainer

    token_list = config["token_list"]
    if isinstance(token_list, (str, Path)):
        token_list = [t for t in Path(token_list).read_text().splitlines() if t]
    vocab = len(token_list)
    model = build_tts_model(config, vocab)
    tx = build_tx(config)
    pre = build_preprocessor(config, token_list)
    train_ds = ESPnetDataset(train_data, preprocessor=pre)
    valid_ds = ESPnetDataset(valid_data, preprocessor=pre)
    shapes = {uid: train_ds[uid]["speech"].shape for uid in train_ds.keys}
    vshapes = {uid: valid_ds[uid]["speech"].shape for uid in valid_ds.keys}
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
    variables = model.init(
        {"params": jax.random.PRNGKey(config.get("seed", 0)),
         "dropout": jax.random.PRNGKey(1)},
        **first,
    )
    from espnet_tpu.train.init_params import apply_param_init

    variables = apply_param_init(variables, config)
    if stats_dir and (Path(stats_dir) / "feats_stats.npz").exists():
        import shutil

        d = np.load(Path(stats_dir) / "feats_stats.npz")
        mean = (d["sum"] / d["count"]).astype(np.float32)
        std = np.sqrt(np.maximum(d["sum_square"] / d["count"] - mean**2, 1e-20)).astype(np.float32)
        variables = dict(variables)
        variables["norm_stats"] = {"mean": mean, "std": std}
        shutil.copy(Path(stats_dir) / "feats_stats.npz", Path(expdir) / "feats_stats.npz")
    save_yaml(Path(expdir) / "config.yaml", {**config, "token_list": token_list})
    state = trainer.init_state(variables, seed=config.get("seed", 0))
    state = trainer.resume(state)
    state = trainer.run(state, train_iter, valid_iter)
    trainer.average_best_params(state)
    return trainer
