"""Streaming recognition (reference: espnet/nets/pytorch_backend/streaming/
window.py WindowStreamingE2E:6, segment.py SegmentStreamingE2E:5).

WindowStreaming: re-encode a growing window every `hop` frames and emit
the incremental greedy-CTC hypothesis.
SegmentStreaming: buffer frames; when the greedy CTC path ends with
≥ `blank_dur` blanks after having seen speech, close the segment, decode
it (beam or greedy), reset the buffer.
"""
from __future__ import annotations

from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _pad_frames(buf: np.ndarray, pad_to: int) -> np.ndarray:
    """Pad the frame axis up to a multiple of pad_to: the growing window
    then hits O(maxlen/pad_to) distinct shapes instead of one per hop, so
    the jitted encoder compiles a handful of bucketed programs and reuses
    them (a growing unpadded window would recompile EVERY hop — ruinous
    with TPU remote compiles)."""
    t = buf.shape[0]
    t_pad = (t + pad_to - 1) // pad_to * pad_to
    if t_pad == t:
        return buf
    pad = [(0, t_pad - t)] + [(0, 0)] * (buf.ndim - 1)
    return np.pad(buf, pad)


def _fused_greedy_step(model, variables):
    """ONE jitted dispatch per hop: encode → CTC head → frame argmax,
    returning only the (T',) id path + valid length. Under the tunnel a
    dispatch costs ~1.3 ms and a (1, T', V) log-prob readback costs
    ~bandwidth×0.5 MB — the previous two-dispatch + full-tensor design
    paid both TWICE per hop and dominated the 73 ms/hop round-3 number
    (docs/BENCHMARKS.md streaming row). The argmax path is a few KB."""

    @jax.jit
    def step(speech, lens):
        hs, hlens = model.apply(variables, speech, lens, method="encode")
        logp = model.apply(variables, hs, method="ctc_log_softmax")
        return jnp.argmax(logp, axis=-1).astype(jnp.int32), hlens

    return step


def _collapse_path(path: np.ndarray) -> List[int]:
    """CTC collapse of a greedy frame path (blank=0)."""
    seq, prev = [], -1
    for p in path:
        if p != 0 and p != prev:
            seq.append(int(p))
        prev = p
    return seq


class WindowStreamingASR:
    """Growing-window streaming with a DEVICE-RESIDENT buffer.

    Per hop, only the new chunk (hop × D, a few KB) is uploaded; one
    fused dispatch does dynamic_update_slice into the on-device window
    + encode + CTC argmax, returning just the id path. Measured on the
    tunnel (tools/bench_streaming.py): the per-dispatch floor is
    ~25 ms and the encode compute is ~1 ms regardless of window size
    (128 → 1024 frames identical) — so re-uploading the whole window
    every hop (the previous design, 62 ms/hop median) paid pure
    transfer cost. The buffer capacity doubles from `pad_to` as the
    stream grows, so the encoder compiles O(log T) programs total.
    """

    def __init__(self, model, variables, hop_frames: int = 16,
                 pad_to: int = 64, max_frames: int = 8192):
        self.model = model
        self.variables = variables
        self.hop = hop_frames
        self.pad_to = pad_to
        self.max_frames = max_frames
        self.buf = None            # device (1, cap, D)
        self.t_cur = 0
        self._steps = {}           # (cap, chunk_pad) -> jitted fused step

    def _step_fn(self, cap: int, chunk_pad: int):
        key = (cap, chunk_pad)
        if key not in self._steps:
            model, variables = self.model, self.variables

            @jax.jit
            def step(buf, chunk, t_cur, total_len):
                start = (0, t_cur) + (0,) * (buf.ndim - 2)
                buf = jax.lax.dynamic_update_slice(buf, chunk, start)
                hs, hlens = model.apply(
                    variables, buf, total_len[None], method="encode"
                )
                logp = model.apply(variables, hs, method="ctc_log_softmax")
                return buf, jnp.argmax(logp, axis=-1).astype(jnp.int32), hlens

            self._steps[key] = step
        return self._steps[key]

    def reset(self):
        self.buf, self.t_cur = None, 0

    def accept_input(self, frames: np.ndarray) -> List[int]:
        """frames: (t, D) new feature frames — or (t,) raw samples when
        the model carries an in-model frontend — → current hypothesis
        ids."""
        frames = np.asarray(frames, dtype=np.float32)
        t_new = frames.shape[0]
        trail = ((0, 0),) * (frames.ndim - 1)
        chunk_pad = max(
            (t_new + self.hop - 1) // self.hop * self.hop, self.hop
        )
        if chunk_pad > t_new:
            frames = np.pad(frames, ((0, chunk_pad - t_new),) + trail)
        if self.buf is None:
            self.t_cur = 0  # `stream.buf = None` is the legacy reset
        total = self.t_cur + t_new
        if total > self.max_frames:
            raise ValueError(
                f"window stream exceeded max_frames={self.max_frames}; "
                "use SegmentStreamingASR for unbounded streams"
            )
        cap = self.pad_to
        while cap < total:
            cap *= 2
        if self.buf is None:
            self.buf = jnp.zeros((1, cap) + frames.shape[1:], jnp.float32)
        elif self.buf.shape[1] < cap:
            # rare growth hop: zero-extend on device
            self.buf = jnp.pad(
                self.buf, ((0, 0), (0, cap - self.buf.shape[1])) + trail
            )
        step = self._step_fn(cap, chunk_pad)
        self.buf, ids, hlens = step(
            self.buf, jnp.asarray(frames[None]),
            jnp.int32(self.t_cur), jnp.int32(total),
        )
        self.t_cur = total
        path = np.asarray(ids)[0, : int(hlens[0])]
        return _collapse_path(path)


class SegmentStreamingASR:
    def __init__(
        self,
        model,
        variables,
        decode_fn: Optional[Callable[[np.ndarray], List[int]]] = None,
        min_blank_dur: int = 4,
        min_speech_frames: int = 4,
        pad_to: int = 64,
    ):
        self.model = model
        self.variables = variables
        self.min_blank = min_blank_dur
        self.min_speech = min_speech_frames
        self.pad_to = pad_to
        self.buf: Optional[np.ndarray] = None
        self.decode_fn = decode_fn
        self._step = _fused_greedy_step(model, variables)

    def _greedy_path(self, frames: np.ndarray) -> np.ndarray:
        padded = _pad_frames(frames, self.pad_to)
        ids, hlens = self._step(
            jnp.asarray(padded[None]), jnp.array([frames.shape[0]])
        )
        return np.asarray(ids)[0, : int(hlens[0])]

    def accept_input(self, frames: np.ndarray) -> Optional[List[int]]:
        """Returns a finalized segment hypothesis when a segment closes."""
        self.buf = frames if self.buf is None else np.concatenate([self.buf, frames])
        path = self._greedy_path(self.buf)
        nonblank = np.nonzero(path)[0]
        if len(nonblank) < 1:
            return None
        trailing_blanks = len(path) - 1 - nonblank[-1]
        if trailing_blanks >= self.min_blank and len(nonblank) >= 1:
            seg = self.buf
            self.buf = None
            if self.decode_fn is not None:
                return self.decode_fn(seg)
            return _collapse_path(path)
        return None

    def flush(self) -> Optional[List[int]]:
        """Force-close the open segment at end of stream (the reference
        decodes whatever remains buffered when input ends)."""
        if self.buf is None or len(self.buf) == 0:
            return None
        seg, self.buf = self.buf, None
        if self.decode_fn is not None:
            return self.decode_fn(seg)
        return _collapse_path(self._greedy_path(seg))
