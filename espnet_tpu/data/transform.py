"""Yaml-configured host-side preprocessing chain (reference:
espnet/transform/transformation.py:49 Transformation + alias registry
:25-46): a list of {type: name, ...kwargs} applied in order to numpy
arrays at data-load time, with a train/eval mode flag.

On-device SpecAugment lives in ops/specaug.py; these numpy transforms
cover the espnet1-style precomputed-feature pipelines (CMVN, deltas,
perturbations, fbank from wav).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence, Union

import numpy as np


def spectrogram(x: np.ndarray, n_fft: int = 512, hop_length: int = 128) -> np.ndarray:
    """Log power spectrogram of a waveform (numpy mirror of ops.stft)."""
    from espnet_tpu.ops.stft import hann_window

    pad = n_fft // 2
    xp = np.pad(x, (pad, pad), mode="reflect")
    t = (len(xp) - n_fft) // hop_length + 1
    idx = np.arange(t)[:, None] * hop_length + np.arange(n_fft)[None, :]
    frames = xp[idx] * hann_window(n_fft)
    spec = np.abs(np.fft.rfft(frames, axis=-1)) ** 2
    return np.log(np.maximum(spec, 1e-10)).astype(np.float32)


def fbank(
    x: np.ndarray,
    fs: int = 16000,
    n_fft: int = 512,
    hop_length: int = 128,
    n_mels: int = 80,
) -> np.ndarray:
    from espnet_tpu.ops.stft import hann_window, mel_filterbank

    pad = n_fft // 2
    xp = np.pad(x, (pad, pad), mode="reflect")
    t = (len(xp) - n_fft) // hop_length + 1
    idx = np.arange(t)[:, None] * hop_length + np.arange(n_fft)[None, :]
    frames = xp[idx] * hann_window(n_fft)
    power = np.abs(np.fft.rfft(frames, axis=-1)) ** 2
    mel = power @ mel_filterbank(fs, n_fft, n_mels)
    return np.log(np.maximum(mel, 1e-10)).astype(np.float32)


class CMVN:
    """Apply precomputed CMVN stats (espnet/transform/cmvn.py:8)."""

    def __init__(self, stats_file: str, norm_means=True, norm_vars=True):
        from espnet_tpu.data.kaldi_io import read_cmvn_stats

        count, s, sq = read_cmvn_stats(stats_file)
        self.mean = s / count
        self.std = np.sqrt(np.maximum(sq / count - self.mean**2, 1e-20))
        self.norm_means = norm_means
        self.norm_vars = norm_vars

    def __call__(self, x, train=True):
        if self.norm_means:
            x = x - self.mean
        if self.norm_vars:
            x = x / self.std
        return x.astype(np.float32)


class UtteranceCMVN:
    def __init__(self, norm_means=True, norm_vars=False):
        self.norm_means, self.norm_vars = norm_means, norm_vars

    def __call__(self, x, train=True):
        if self.norm_means:
            x = x - x.mean(axis=0)
        if self.norm_vars:
            x = x / np.maximum(x.std(axis=0), 1e-10)
        return x.astype(np.float32)


def add_deltas(x: np.ndarray, window: int = 2, order: int = 2) -> np.ndarray:
    """Append delta (+delta-delta) features (add_deltas.py:23)."""
    feats = [x]
    base = x
    for _ in range(order):
        delta = np.zeros_like(base)
        denom = 2 * sum(i * i for i in range(1, window + 1))
        for i in range(1, window + 1):
            fwd = np.concatenate([base[i:], np.repeat(base[-1:], i, 0)], 0)
            bwd = np.concatenate([np.repeat(base[:1], i, 0), base[:-i]], 0)
            delta += i * (fwd - bwd)
        base = delta / denom
        feats.append(base)
    return np.concatenate(feats, axis=-1).astype(np.float32)


class SpeedPerturbation:
    """Linear-interp resample by a random ratio (perturb.py:9)."""

    def __init__(self, lower=0.9, upper=1.1, keep_length=False, seed=0):
        self.lower, self.upper = lower, upper
        self.keep_length = keep_length
        self.rng = np.random.RandomState(seed)

    def __call__(self, x, train=True):
        if not train:
            return x
        ratio = self.rng.uniform(self.lower, self.upper)
        n = len(x)
        m = n if self.keep_length else int(round(n / ratio))
        src = np.minimum(np.arange(m) * ratio, n - 1)
        lo = src.astype(int)
        hi = np.minimum(lo + 1, n - 1)
        frac = src - lo
        return (x[lo] * (1 - frac) + x[hi] * frac).astype(np.float32)


class NoiseInjection:
    def __init__(self, lower=-20, upper=-5, seed=0):
        self.lower, self.upper = lower, upper
        self.rng = np.random.RandomState(seed)

    def __call__(self, x, train=True):
        if not train:
            return x
        snr_db = self.rng.uniform(self.lower, self.upper)
        noise = self.rng.randn(*x.shape)
        scale = np.sqrt(
            (x**2).mean() / np.maximum((noise**2).mean(), 1e-10)
        ) * 10 ** (snr_db / 20)
        return (x + scale * noise).astype(np.float32)


class FreqMask:
    def __init__(self, F=10, n_mask=2, seed=0):
        self.F, self.n, self.rng = F, n_mask, np.random.RandomState(seed)

    def __call__(self, x, train=True):
        if not train:
            return x
        x = x.copy()
        for _ in range(self.n):
            w = self.rng.randint(0, self.F + 1)
            f0 = self.rng.randint(0, max(x.shape[1] - w, 1))
            x[:, f0: f0 + w] = 0
        return x


class TimeMask:
    def __init__(self, T=40, n_mask=2, seed=0):
        self.T, self.n, self.rng = T, n_mask, np.random.RandomState(seed)

    def __call__(self, x, train=True):
        if not train:
            return x
        x = x.copy()
        for _ in range(self.n):
            w = self.rng.randint(0, self.T + 1)
            t0 = self.rng.randint(0, max(x.shape[0] - w, 1))
            x[t0: t0 + w] = 0
        return x


def _fn_transform(fn):
    class _T:
        def __init__(self, **kw):
            self.kw = kw

        def __call__(self, x, train=True):
            return fn(x, **self.kw)

    return _T


class ChannelSelector:
    """Pick one channel from [Time, Channel] input (reference:
    espnet/transform/channel_selector.py). train_channel='random' draws a
    channel per call; eval uses a fixed index."""

    def __init__(self, train_channel="random", eval_channel=0, axis=1, seed=0):
        self.train_channel = train_channel
        self.eval_channel = eval_channel
        self.axis = axis
        self.rng = np.random.RandomState(seed)

    def __call__(self, x, train=True):
        if x.ndim <= self.axis:
            return x
        ch = self.train_channel if train else self.eval_channel
        if ch == "random":
            ch = self.rng.randint(x.shape[self.axis])
        return np.take(x, int(ch), axis=self.axis)


class RIRConvolve:
    """Convolve the waveform with a room impulse response (reference:
    espnet/transform/perturb.py:303). utt2rir maps uttid → rir wav path;
    a multi-channel RIR produces [Time, Channel] output."""

    def __init__(self, utt2rir, filetype="list"):
        from espnet_tpu.data.wav import read_audio

        self.utt2rir = {}
        if filetype == "list":
            with open(utt2rir) as f:
                for line in f:
                    utt, fname = line.rstrip().split(None, 1)
                    rate, signal = read_audio(fname, normalize=False)
                    self.utt2rir[utt] = (signal, rate)
        elif filetype == "sound.hdf5":
            from espnet_tpu.data.hdf5 import SoundHDF5File

            with SoundHDF5File(utt2rir, "r") as f:
                for k, (sig, rate) in f.items():
                    self.utt2rir[k] = (sig, rate)
        else:
            raise NotImplementedError(filetype)

    def __call__(self, x, train=True, uttid=None):
        if not train or uttid not in self.utt2rir:
            return x
        from scipy.signal import fftconvolve

        x = x.astype(np.float32)
        rir, _ = self.utt2rir[uttid]
        rir = np.asarray(rir, dtype=np.float32)
        if rir.ndim == 2:
            out = np.stack(
                [fftconvolve(x, rir[:, c], mode="full")[: len(x)]
                 for c in range(rir.shape[1])],
                axis=-1,
            )
            return out
        return fftconvolve(x, rir, mode="full")[: len(x)]


class WPE:
    """Host-side weighted-prediction-error dereverberation on STFT
    features [Time, Channel, Frequency] (reference:
    espnet/transform/wpe.py:4 via nara_wpe — own numpy implementation
    here, same recursion as models/enh/beamformer.wpe_dereverb)."""

    def __init__(self, taps=10, delay=3, iterations=3, eps=1e-6):
        self.taps = taps
        self.delay = delay
        self.iterations = iterations
        self.eps = eps

    def __call__(self, xs, train=True):
        # xs: (T, C, F) complex → same
        x = np.asarray(xs).transpose(2, 0, 1)  # (F, T, C)
        f, t, c = x.shape
        xd = np.zeros((f, t, c * self.taps), dtype=x.dtype)
        for k in range(self.taps):
            shift = self.delay + k
            if shift < t:
                xd[:, shift:, k * c : (k + 1) * c] = x[:, : t - shift]
        y = x
        for _ in range(self.iterations):
            power = np.maximum((np.abs(y) ** 2).mean(axis=-1), self.eps)
            w = (1.0 / power)[..., None]  # (F, T, 1)
            a = np.einsum("fti,ftj->fij", np.conj(xd) * w, xd)
            rhs = np.einsum("fti,ftj->fij", np.conj(xd) * w, x)
            a = a + self.eps * np.eye(a.shape[-1], dtype=a.dtype)
            g = np.linalg.solve(a, rhs)  # (F, CK, C)
            y = x - np.einsum("fti,fij->ftj", xd, g)
        return y.transpose(1, 2, 0)  # (T, C, F)


REGISTRY: Dict[str, Callable] = {
    "cmvn": CMVN,
    "utterance_cmvn": UtteranceCMVN,
    "delta": _fn_transform(add_deltas),
    "speed_perturbation": SpeedPerturbation,
    "noise_injection": NoiseInjection,
    "freq_mask": FreqMask,
    "time_mask": TimeMask,
    "spectrogram": _fn_transform(spectrogram),
    "fbank": _fn_transform(fbank),
    "channel_selector": ChannelSelector,
    "rir_convolve": RIRConvolve,
    "wpe": WPE,
}


class Transformation:
    """Chain built from a yaml file or a list of conf dicts:
    {"process": [{"type": "fbank", ...}, {"type": "cmvn", ...}]}."""

    def __init__(self, conf: Union[str, List[Dict[str, Any]], None]):
        if conf is None:
            self.fns = []
            return
        if isinstance(conf, str):
            import yaml

            with open(conf) as f:
                conf = yaml.safe_load(f)["process"]
        elif isinstance(conf, dict):
            conf = conf["process"]
        self.fns = []
        for entry in conf:
            entry = dict(entry)
            typ = entry.pop("type")
            self.fns.append(REGISTRY[typ](**entry))

    def __call__(
        self, x: np.ndarray, train: bool = True, uttid: Optional[str] = None
    ) -> np.ndarray:
        import inspect

        for fn in self.fns:
            if "uttid" in inspect.signature(fn.__call__).parameters:
                x = fn(x, train=train, uttid=uttid)
            else:
                x = fn(x, train=train)
        return x
