"""Pallas TPU kernels for the RNN-T (T,U) lattice recursion.

Replaces warp-transducer / warp-rnnt (reference:
espnet/nets/pytorch_backend/transducer/loss.py:8) the same way
losses/pallas_ctc.py replaces warp-ctc. Design:

- blank/emit log-probs are pre-gathered OUTSIDE the kernel
  ((B,T,U+1)/(B,T,U) from the joint logits — one XLA gather + logsumexp);
  the kernels own only the sequential T-recursion, streamed over a
  T-grid in (T, B, S) layout with the recursion row carried in VMEM
  scratch — the whole batch advances in ONE serial T sweep.
- Within a time step the u-recursion
      α(t,u) = logadd(α(t-1,u)+blank(t-1,u), α(t,u-1)+emit(t,u-1))
  is a log-space linear recurrence solved in closed form:
      α(t,·) = C + logcumsumexp(A − C),  A = α(t-1)+blank(t-1),
      C(u) = Σ_{j<u} emit(t,j).
  The prefix sums run on the MXU as triangular matmuls
  ((8,S)·(S,S) — no sequential u loop, no lax.associative_scan).
- β runs the mirrored recursion with a reversed (upper-triangular)
  matmul; gradients are the standard transition posteriors
      d/d blank(t,u) = −exp(α(t,u)+blank(t,u)+β(t+1,u) − logZ)
      d/d emit(t,u)  = −exp(α(t,u)+emit(t,u)+β(t,u+1) − logZ)
  assembled in XLA from the two kernel outputs, wired via
  jax.custom_vjp (training never differentiates through a scan).

Numerics match losses/transducer.py (the lax.scan reference); tests
assert allclose on loss and gradients.

fp32 note: each prefix logsumexp subtracts one per-row max, so terms
≥ ~88 log-units below the row max underflow to 0 — the same truncation
every logsumexp makes; their posteriors are ≈0 anyway.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1.0e10
LANE = 128
TINY = 1e-37
CHUNK = 8  # batch padded to the VPU sublane count


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


BLOCK = 16  # lanes per logsumexp block (range within a block stays tiny)


def _tri(s: int):
    """(strict_lower, blockdiag_incl_lower, blockdiag_incl_upper,
    block_full) S×S masks: strict[j,u]=1 iff j<u (full row, used for the
    PLAIN cumsum of log-probs — a linear sum, no exp); the block-diagonal
    triangulars confine the exp-space prefix/suffix sums to one BLOCK;
    block_full[j,u]=1 iff same block (block totals). Contraction runs
    over j (axis 0)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
    same_block = (r // BLOCK) == (c // BLOCK)
    return (
        (r < c).astype(jnp.float32),
        (same_block & (r <= c)).astype(jnp.float32),
        (same_block & (r >= c)).astype(jnp.float32),
        same_block.astype(jnp.float32),
    )


def _logadd2(a, b):
    m = jnp.maximum(a, b)
    out = m + jnp.log(jnp.exp(a - m) + jnp.exp(b - m))
    return jnp.where(m <= NEG_INF / 2, NEG_INF, out)


def _block_max(x, lanepos, s):
    """Every lane ← max over its BLOCK, via a masked roll butterfly
    (Mosaic supports no cross-lane reshape; rolls are native). Masking by
    the destination lane keeps each lane's window inside its own block,
    so no cross-block contamination by induction."""
    m = x
    sh = 1
    while sh < BLOCK:
        right = pltpu.roll(m, sh, 1)
        left = pltpu.roll(m, s - sh, 1)
        m = jnp.maximum(m, jnp.where(lanepos >= sh, right, NEG_INF))
        m = jnp.maximum(m, jnp.where(lanepos < BLOCK - sh, left, NEG_INF))
        sh *= 2
    return jnp.maximum(m, NEG_INF)


def _cumlse(x, blockdiag_mask, blockfull_mask, col, reverse=False):
    """Exact per-row prefix (or suffix) logsumexp of x (CH,S).

    A single row-global max cannot stabilise this: lattice rows span
    hundreds of log-units and the ANSWER is read at α(t,llen), often far
    below the row max — flooring or truncating against a global max
    corrupts it (observed: likelihood inflated by e^80 over 256 frames).
    Instead: per-BLOCK maxima make every 16-lane block exact (only terms
    ≥88 below their own block max underflow, which are negligible to any
    consumer in that block), block-local prefix/total sums run on the
    MXU via block-diagonal masks, and the K = S/16 block totals combine
    with an exact sequential log-add carry (unrolled, K≤16)."""
    ch, s = x.shape
    k = s // BLOCK
    lanepos = col % BLOCK
    m = _block_max(x, lanepos, s)
    ex = jnp.where(x <= NEG_INF / 2, 0.0, jnp.exp(x - m))
    y = jnp.dot(ex, blockdiag_mask, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    local = jnp.where(y > 0.0, m + jnp.log(jnp.maximum(y, TINY)), NEG_INF)
    tot = jnp.dot(ex, blockfull_mask, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    t_lane = jnp.where(tot > 0.0, m + jnp.log(jnp.maximum(tot, TINY)), NEG_INF)
    # exclusive carry over blocks: one block-shift then a Hillis-Steele
    # inclusive log-add scan at block granularity (log2(K) roll steps,
    # each an exact pairwise log-add — no row reductions)
    blkid = col // BLOCK
    if reverse:
        carry = jnp.where(
            blkid < k - 1, pltpu.roll(t_lane, s - BLOCK, 1), NEG_INF
        )
        step = 1
        while step < k:
            shifted = pltpu.roll(carry, s - step * BLOCK, 1)
            carry = _logadd2(
                carry, jnp.where(blkid < k - step, shifted, NEG_INF)
            )
            step *= 2
    else:
        carry = jnp.where(blkid >= 1, pltpu.roll(t_lane, BLOCK, 1), NEG_INF)
        step = 1
        while step < k:
            shifted = pltpu.roll(carry, step * BLOCK, 1)
            carry = _logadd2(
                carry, jnp.where(blkid >= step, shifted, NEG_INF)
            )
            step *= 2
    return _logadd2(local, carry)


def _rnnt_alpha_kernel(lpb_ref, cum_ref, ilen_ref, llen_ref, alpha_ref, row_ref):
    """T-streamed ((T, B, S) layout): lpb block at t-1 (blank log-probs),
    cum block at t (EXCLUSIVE per-frame cumsum of emit log-probs,
    C(t,u) = Σ_{j<u} emit(t,j), precomputed in XLA — a plain linear sum,
    cheaper outside), lengths as VMEM vectors → alpha block at t. The
    recursion row lives in VMEM scratch across grid steps, so the WHOLE
    batch runs in one serial T sweep instead of B/chunk sweeps."""
    t = pl.program_id(0)
    _, ch, s = lpb_ref.shape
    ilen = ilen_ref[:, :]  # (CH, 1)
    llen = llen_ref[:, :]
    col = jax.lax.broadcasted_iota(jnp.int32, (ch, s), 1)
    valid_u = col <= llen
    _, t_incl, _, t_full = _tri(s)
    c = cum_ref[0]  # (CH, S) at t

    @pl.when(t == 0)
    def _init():
        # t=0: alpha(0,u) = Σ_{j<u} emit(0,j)
        row_ref[:, :] = jnp.where(valid_u, jnp.maximum(c, NEG_INF), NEG_INF)

    @pl.when(t > 0)
    def _step():
        alpha = row_ref[:, :]
        a = alpha + lpb_ref[0]  # lpb block is at t-1
        x = jnp.where(valid_u, a - c, NEG_INF)
        new = c + _cumlse(x, t_incl, t_full, col)  # prefix (j ≤ u)
        new = jnp.where(valid_u, jnp.maximum(new, NEG_INF), NEG_INF)
        row_ref[:, :] = jnp.where(t < ilen, new, alpha)  # freeze finished

    alpha_ref[0] = row_ref[:, :]


def _rnnt_beta_kernel(lpb_ref, cum_ref, ilen_ref, llen_ref, beta_ref, row_ref):
    """beta, (T, B, S) layout: β(t,u) = log P(complete from (t,u)),
    including the final blank at (ilen-1, llen). Streamed in reverse
    time: grid step i visits t = T-1-i; lpb/cum blocks are at t."""
    t_max = pl.num_programs(0)
    i = pl.program_id(0)
    t = t_max - 1 - i
    _, ch, s = lpb_ref.shape
    ilen = ilen_ref[:, :]
    llen = llen_ref[:, :]
    col = jax.lax.broadcasted_iota(jnp.int32, (ch, s), 1)
    valid_u = col <= llen
    _, _, t_upper, t_full = _tri(s)
    terminal = jnp.where(col == llen, 0.0, NEG_INF)  # virtual β(ilen,·)

    @pl.when(i == 0)
    def _init():
        row_ref[:, :] = jnp.full((ch, s), NEG_INF)

    beta = row_ref[:, :]
    beta_next = jnp.where(t == ilen - 1, terminal, beta)
    bv = lpb_ref[0] + beta_next
    d = cum_ref[0]
    x = jnp.where(valid_u, bv + d, NEG_INF)
    new = -d + _cumlse(x, t_upper, t_full, col, reverse=True)  # suffix (j ≥ u)
    new = jnp.where((t < ilen) & valid_u, jnp.maximum(new, NEG_INF), NEG_INF)
    row_ref[:, :] = new
    beta_ref[0] = new


def _pad_lane(x, s_pad):
    pad = s_pad - x.shape[-1]
    if pad <= 0:
        return x
    return jnp.pad(
        x, [(0, 0)] * (x.ndim - 1) + [(0, pad)], constant_values=NEG_INF
    )


def _pad_b(x, b_pad, fill):
    pad = b_pad - x.shape[0]
    if pad <= 0:
        return x
    return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1), constant_values=fill)


def _exclusive_cumsum(lpe):
    """C(t,u) = Σ_{j<u} lpe(t,j) — the per-frame emit prefix sums both
    kernels consume (computed here in XLA; a linear sum, no logsumexp)."""
    return jnp.pad(jnp.cumsum(lpe, axis=2), ((0, 0), (0, 0), (1, 0)))[:, :, :-1]


def _run(kernel, lpb, cum, ilens, llens, interpret, reverse):
    """Launch a T-streamed lattice kernel. `reverse=False` (alpha): lpb
    block at max(t-1, 0), cum at t, output at t. `reverse=True` (beta):
    step i visits t = T-1-i; lpb/cum/output blocks at that t."""
    b, t, s_pad = lpb.shape
    b_pad = _round_up(b, CHUNK)
    args = (
        jnp.transpose(_pad_b(lpb, b_pad, NEG_INF), (1, 0, 2)),
        jnp.transpose(_pad_b(cum, b_pad, NEG_INF), (1, 0, 2)),
        _pad_b(ilens.astype(jnp.int32), b_pad, 0)[:, None],
        _pad_b(llens.astype(jnp.int32), b_pad, 0)[:, None],
    )
    if reverse:
        lpb_idx = cum_idx = out_idx = lambda tt: (t - 1 - tt, 0, 0)
    else:
        lpb_idx = lambda tt: (jnp.maximum(tt - 1, 0), 0, 0)
        cum_idx = out_idx = lambda tt: (tt, 0, 0)
    out = pl.pallas_call(
        kernel,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, b_pad, s_pad), lpb_idx),
            pl.BlockSpec((1, b_pad, s_pad), cum_idx),
            pl.BlockSpec((b_pad, 1), lambda tt: (0, 0)),
            pl.BlockSpec((b_pad, 1), lambda tt: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, b_pad, s_pad), out_idx),
        out_shape=jax.ShapeDtypeStruct((t, b_pad, s_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((b_pad, s_pad), jnp.float32)],
        interpret=interpret,
    )(*args)
    return jnp.transpose(out, (1, 0, 2))[:b]


def _prep(lp_blank, lp_emit, label_lengths):
    b, t, u1 = lp_blank.shape
    u = u1 - 1
    s_pad = _round_up(u1, LANE)
    upos = jnp.arange(u)[None, None, :]
    lpe = jnp.where(upos < label_lengths[:, None, None], lp_emit, NEG_INF)
    return (
        _pad_lane(lp_blank.astype(jnp.float32), s_pad),
        _pad_lane(lpe.astype(jnp.float32), s_pad),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def rnnt_loss_pallas(
    lp_blank, lp_emit, input_lengths, label_lengths, interpret=False
):
    """Per-utterance RNN-T NLL via Pallas kernels.

    API matches losses.transducer.rnnt_loss_from_log_probs:
    lp_blank (B,T,U+1), lp_emit (B,T,U) pre-gathered log-probs.
    """
    nll, _ = _rnnt_fwd(lp_blank, lp_emit, input_lengths, label_lengths, interpret)
    return nll


def _rnnt_fwd(lp_blank, lp_emit, input_lengths, label_lengths, interpret):
    lpb, lpe = _prep(lp_blank, lp_emit, label_lengths)
    cum = _exclusive_cumsum(lpe)
    alpha = _run(
        _rnnt_alpha_kernel, lpb, cum, input_lengths, label_lengths,
        interpret, reverse=False,
    )
    # loglik = α(ilen-1, llen) + blank(ilen-1, llen)
    it = jnp.maximum(input_lengths - 1, 0)[:, None, None]
    a_fin = jnp.take_along_axis(alpha, it, axis=1)[:, 0]
    a_fin = jnp.take_along_axis(a_fin, label_lengths[:, None], axis=1)[:, 0]
    b_fin = jnp.take_along_axis(lpb, it, axis=1)[:, 0]
    b_fin = jnp.take_along_axis(b_fin, label_lengths[:, None], axis=1)[:, 0]
    ll = a_fin + b_fin
    res = (lpb, lpe, input_lengths, label_lengths, alpha, ll,
           lp_blank.shape, lp_emit.shape)
    return -ll, res


def _rnnt_bwd(interpret, res, g):
    lpb, lpe, input_lengths, label_lengths, alpha, ll, blank_shape, emit_shape = res
    b, t, s_pad = lpb.shape
    beta = _run(
        _rnnt_beta_kernel, lpb, _exclusive_cumsum(lpe), input_lengths,
        label_lengths, interpret, reverse=True,
    )

    col = jnp.arange(s_pad)[None, None, :]
    tpos = jnp.arange(t)[None, :, None]
    ilen = input_lengths[:, None, None]
    llen = label_lengths[:, None, None]

    # β(t+1,u) with the virtual terminal row at t = ilen-1
    terminal = jnp.where(col == llen, 0.0, NEG_INF)
    beta_next = jnp.concatenate(
        [beta[:, 1:], jnp.full((b, 1, s_pad), NEG_INF)], axis=1
    )
    beta_next = jnp.where(tpos == ilen - 1, terminal, beta_next)
    # β(t,u+1): shift left along lanes
    beta_u1 = jnp.concatenate(
        [beta[:, :, 1:], jnp.full((b, t, 1), NEG_INF)], axis=2
    )

    valid = (tpos < ilen) & (col <= llen)
    post_blank = jnp.exp(
        jnp.minimum(jnp.where(valid, alpha + lpb + beta_next - ll[:, None, None], NEG_INF), 0.0)
    )
    post_blank = jnp.where(valid, post_blank, 0.0)
    post_emit = jnp.exp(
        jnp.minimum(jnp.where(valid & (col < llen), alpha + lpe + beta_u1 - ll[:, None, None], NEG_INF), 0.0)
    )
    post_emit = jnp.where(valid & (col < llen), post_emit, 0.0)

    gb = g[:, None, None]
    d_blank = (-post_blank * gb)[:, :, : blank_shape[2]]
    d_emit = (-post_emit * gb)[:, :, : emit_shape[2]]
    return (d_blank, d_emit, None, None)


rnnt_loss_pallas.defvjp(_rnnt_fwd, _rnnt_bwd)


def rnnt_loss_logits_pallas(
    logits, labels, input_lengths, label_lengths, blank: int = 0,
    interpret: bool = False,
):
    """Joint-logits convenience wrapper (API = losses.transducer.rnnt_loss):
    the softmax/gather runs (and differentiates) in XLA; the lattice runs
    in the Pallas kernels."""
    lse = jax.nn.logsumexp(logits, axis=-1)
    lp_blank = logits[..., blank] - lse
    labels_c = jnp.where(labels < 0, 0, labels)
    lab = jnp.broadcast_to(
        labels_c[:, None, :],
        (logits.shape[0], logits.shape[1], labels.shape[1]),
    )
    lp_emit = (
        jnp.take_along_axis(logits[:, :, :-1, :], lab[..., None], axis=3)[..., 0]
        - lse[:, :, :-1]
    )
    return rnnt_loss_pallas(
        lp_blank, lp_emit, input_lengths, label_lengths, interpret
    )
