"""Pallas TPU kernel for the CTC forward-backward recursion.

Replaces the reference's warp-ctc CUDA kernel (tools warp-ctc,
espnet/nets/pytorch_backend/ctc.py:40). Design:

- Emissions are pre-gathered OUTSIDE the kernel (one XLA gather:
  (B,T,V) × blank-interleaved labels → (B,T,S), S = 2L+1 padded to the
  128 lane width) — gathers are what XLA does well; the kernel owns only
  the sequential T-recursion, keeping the alpha/beta rows resident in
  VMEM.
- Grid tiles the batch in chunks of 8 utterances per program, so every
  VPU op runs on a native (8, 128) tile (full sublane utilisation) —
  per-utterance lengths are handled with per-row masks.
- Backward = mirrored beta recursion kernel; dL/d emit = −exp(α+β−logZ),
  scattered back to (B,T,V) by an XLA scatter-add. Wired via
  jax.custom_vjp, so training never differentiates through a scan.

Numerics identical to the lax.scan reference (losses/ctc.py); tests
assert allclose between both paths and torch.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1.0e10
LANE = 128
CHUNK = 8  # batch padded to the VPU sublane count


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _logadd2(a, b):
    m = jnp.maximum(a, b)
    out = m + jnp.log(jnp.exp(a - m) + jnp.exp(b - m))
    return jnp.where(m <= NEG_INF / 2, NEG_INF, out)


def _alpha_kernel(emit_ref, skip_ref, ilen_ref, alpha_ref, row_ref):
    """T-streamed: arrays in (T, B, S) layout, emit block (1, B, S) at
    t = program_id(0); the alpha row is carried in VMEM scratch across
    grid steps. Streaming over T keeps VMEM tiny so the WHOLE batch runs
    in one sequential T sweep — the previous whole-(CH,T,S)-resident
    design had to chunk the batch and so ran the serial T loop B/CH
    times."""
    t = pl.program_id(0)
    _, ch, s = emit_ref.shape
    skip = skip_ref[:, :]  # (CH, S)
    ilen = ilen_ref[:, :]  # (CH, 1) int32 in VMEM
    col = jax.lax.broadcasted_iota(jnp.int32, (ch, s), 1)
    emit_t = emit_ref[0]  # (CH, S)

    @pl.when(t == 0)
    def _init():
        row_ref[:, :] = jnp.where(col < 2, emit_t, NEG_INF)

    @pl.when(t > 0)
    def _step():
        alpha = row_ref[:, :]
        a1 = jnp.where(col >= 1, pltpu.roll(alpha, 1, 1), NEG_INF)
        a2 = jnp.where((col >= 2) & (skip > 0), pltpu.roll(alpha, 2, 1), NEG_INF)
        new = _logadd2(_logadd2(alpha, a1), a2) + emit_t
        new = jnp.maximum(new, NEG_INF)
        row_ref[:, :] = jnp.where(t < ilen, new, alpha)  # freeze finished

    alpha_ref[0] = row_ref[:, :]


def _beta_kernel(emit_next_ref, skip_ref, ilen_ref, llen_ref, beta_ref, row_ref):
    """beta, (T, B, S) layout: completion log-prob from state s at t,
    EXCLUDING the emission at t (so α+β−logZ is the state posterior).
    Streamed in reverse time: grid step i visits t = T-1-i;
    emit_next_ref is the emit block at min(t+1, T-1) via its index
    map."""
    t_max = pl.num_programs(0)
    i = pl.program_id(0)
    t = t_max - 1 - i
    _, ch, s = emit_next_ref.shape
    skip = skip_ref[:, :]
    ilen = ilen_ref[:, :]  # (CH, 1) int32 in VMEM
    llen = llen_ref[:, :]  # (CH, 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (ch, s), 1)
    end_mask = (col == 2 * llen) | ((col == 2 * llen - 1) & (llen > 0))
    skip_fwd = pltpu.roll(skip, s - 2, 1)  # skip_fwd[s] = skip[s+2]
    init_row = jnp.where(end_mask, 0.0, NEG_INF)

    @pl.when(i == 0)
    def _init():
        row_ref[:, :] = jnp.full((ch, s), NEG_INF)

    beta = row_ref[:, :]
    b = beta + emit_next_ref[0]
    b1 = jnp.where(col < s - 1, pltpu.roll(b, s - 1, 1), NEG_INF)
    b2 = jnp.where(
        (col < s - 2) & (skip_fwd > 0), pltpu.roll(b, s - 2, 1), NEG_INF
    )
    rec = jnp.maximum(_logadd2(_logadd2(b, b1), b2), NEG_INF)
    # per-row: at t == ilen-1 start from the end states; beyond ilen the
    # row is dead (NEG_INF); otherwise recurse
    beta_new = jnp.where(
        t == ilen - 1, init_row, jnp.where(t < ilen - 1, rec, NEG_INF)
    )
    row_ref[:, :] = beta_new
    beta_ref[0] = beta_new


def _pad_s(x, s_pad, fill):
    pad = s_pad - x.shape[-1]
    if pad <= 0:
        return x
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)], constant_values=fill)


def _prep(log_probs, labels, blank):
    b, t, v = log_probs.shape
    l = labels.shape[1]
    s = 2 * l + 1
    s_pad = _round_up(s, LANE)
    labels_c = jnp.where(labels < 0, blank, labels)
    ext = jnp.full((b, s), blank, dtype=jnp.int32)
    ext = ext.at[:, 1::2].set(labels_c)
    ext_shift2 = jnp.pad(ext, ((0, 0), (2, 0)), constant_values=-1)[:, :s]
    allow_skip = ((ext != blank) & (ext != ext_shift2)).astype(jnp.float32)
    emit = jnp.take_along_axis(log_probs, ext[:, None, :], axis=2)  # (B,T,S)
    emit = _pad_s(emit, s_pad, NEG_INF)
    allow_skip = _pad_s(allow_skip, s_pad, 0.0)
    return emit, allow_skip, ext, s, s_pad


def _pad_b(x, b_pad, fill):
    pad = b_pad - x.shape[0]
    if pad <= 0:
        return x
    return jnp.pad(
        x, [(0, pad)] + [(0, 0)] * (x.ndim - 1), constant_values=fill
    )


def _run_alpha(emit, allow_skip, input_lengths, interpret=False):
    b, t, s_pad = emit.shape
    b_pad = _round_up(b, CHUNK)
    emit_p = jnp.transpose(_pad_b(emit, b_pad, NEG_INF), (1, 0, 2))
    skip_p = _pad_b(allow_skip, b_pad, 0.0)
    ilen_p = _pad_b(input_lengths.astype(jnp.int32), b_pad, 0)[:, None]

    alpha = pl.pallas_call(
        _alpha_kernel,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, b_pad, s_pad), lambda tt: (tt, 0, 0)),
            pl.BlockSpec((b_pad, s_pad), lambda tt: (0, 0)),
            pl.BlockSpec((b_pad, 1), lambda tt: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, b_pad, s_pad), lambda tt: (tt, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((t, b_pad, s_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((b_pad, s_pad), jnp.float32)],
        interpret=interpret,
    )(emit_p, skip_p, ilen_p)
    return jnp.transpose(alpha, (1, 0, 2))[:b]


def _run_beta(emit, allow_skip, input_lengths, label_lengths, interpret=False):
    b, t, s_pad = emit.shape
    b_pad = _round_up(b, CHUNK)
    emit_p = jnp.transpose(_pad_b(emit, b_pad, NEG_INF), (1, 0, 2))
    skip_p = _pad_b(allow_skip, b_pad, 0.0)
    ilen_p = _pad_b(input_lengths.astype(jnp.int32), b_pad, 0)[:, None]
    llen_p = _pad_b(label_lengths.astype(jnp.int32), b_pad, 0)[:, None]

    beta = pl.pallas_call(
        _beta_kernel,
        grid=(t,),
        in_specs=[
            # emit at t_next = min(T-1-i+1, T-1), reverse-time streaming
            pl.BlockSpec(
                (1, b_pad, s_pad), lambda tt: (jnp.minimum(t - tt, t - 1), 0, 0)
            ),
            pl.BlockSpec((b_pad, s_pad), lambda tt: (0, 0)),
            pl.BlockSpec((b_pad, 1), lambda tt: (0, 0)),
            pl.BlockSpec((b_pad, 1), lambda tt: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, b_pad, s_pad), lambda tt: (t - 1 - tt, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((t, b_pad, s_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((b_pad, s_pad), jnp.float32)],
        interpret=interpret,
    )(emit_p, skip_p, ilen_p, llen_p)
    return jnp.transpose(beta, (1, 0, 2))[:b]


def _loglik_from_alpha(alpha, input_lengths, label_lengths):
    ilast = jnp.maximum(input_lengths - 1, 0)[:, None, None]
    a_fin = jnp.take_along_axis(alpha, ilast, axis=1)[:, 0]  # (B, S)
    idx = (2 * label_lengths)[:, None]
    a_last = jnp.take_along_axis(a_fin, idx, axis=1)
    a_prev = jnp.where(
        label_lengths[:, None] > 0,
        jnp.take_along_axis(a_fin, jnp.maximum(idx - 1, 0), axis=1),
        NEG_INF,
    )
    return _logadd2(a_last, a_prev)[:, 0]  # (B,)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def ctc_loss_pallas(
    log_probs, labels, input_lengths, label_lengths, blank=0, interpret=False
):
    """Per-utterance CTC NLL via Pallas kernels (API = losses.ctc.ctc_loss)."""
    nll, _ = _ctc_fwd(
        log_probs, labels, input_lengths, label_lengths, blank, interpret
    )
    return nll


def _ctc_fwd(log_probs, labels, input_lengths, label_lengths, blank, interpret):
    emit, allow_skip, ext, s, s_pad = _prep(log_probs, labels, blank)
    alpha = _run_alpha(emit, allow_skip, input_lengths, interpret)
    ll = _loglik_from_alpha(alpha, input_lengths, label_lengths)
    residuals = (log_probs, labels, input_lengths, label_lengths, alpha, emit, ll)
    return -ll, residuals


def _ctc_bwd(blank, interpret, residuals, g):
    log_probs, labels, input_lengths, label_lengths, alpha, emit, ll = residuals
    b, t, v = log_probs.shape
    _, allow_skip, ext, s, s_pad = _prep(log_probs, labels, blank)
    beta = _run_beta(emit, allow_skip, input_lengths, label_lengths, interpret)

    # dL/d emit(t,s) = −exp(α+β−logZ); α includes emit at t, β excludes it
    gamma = alpha + beta - ll[:, None, None]
    frame_valid = jnp.arange(t)[None, :, None] < input_lengths[:, None, None]
    d_emit = -jnp.exp(jnp.minimum(gamma, 0.0))
    d_emit = jnp.where(frame_valid & (emit > NEG_INF / 2), d_emit, 0.0)
    d_emit = d_emit[:, :, :s]

    # Scatter (B,T,S) state grads back to (B,T,V) as a one-hot matmul on
    # the MXU: XLA's scatter-add serializes on the duplicate blank
    # indices (every even s is blank), costing ~ms; the equivalent
    # einsum over a (B,S,V) one-hot is exact (products are 0/1) and
    # runs at matmul speed. HIGHEST precision keeps the f32 accumulate
    # bit-comparable to the scatter path.
    onehot = jax.nn.one_hot(ext, v, dtype=d_emit.dtype)  # (B, S, V)
    d_lp = jnp.einsum(
        "bts,bsv->btv", d_emit, onehot, precision=jax.lax.Precision.HIGHEST
    )
    d_lp = d_lp * g[:, None, None]
    return (d_lp, None, None, None)


ctc_loss_pallas.defvjp(_ctc_fwd, _ctc_bwd)
