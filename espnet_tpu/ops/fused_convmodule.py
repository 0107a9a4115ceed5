"""Fused Conformer convolution-module kernel (Pallas, TPU).

The conv module (reference conformer/convolution.py:13 — pointwise GLU →
depthwise k31 → norm → swish → pointwise) is FLOP-light but HBM-heavy:
the XLA path makes ~10 full passes over the (B, T, D) activations
(pointwise matmuls, GLU halves, depthwise conv, f32 GroupNorm statistics,
swish, three pad-masks), measuring ~140 µs/block at b128/T128/D256 for
~15 µs of matmul FLOPs (docs/BENCHMARKS.md encoder sweep). This kernel
runs the whole module per batch row in VMEM: read x once, write out
once — everything in between (GLU, 31-tap depthwise shift-and-add,
GroupNorm(1) statistics, swish, both pointwise matmuls) never touches
HBM. Weights (≈0.8 MB) are resident per grid cell.

Backward is a second kernel over the same grid that recomputes the
forward intermediates per row (flash-style) and accumulates weight
gradients across the sequential TPU grid into its output refs.

Numerics match the unfused path (layers/convolution.py): matmuls
accumulate in f32 (preferred_element_type), GroupNorm statistics are
f32 over the full (T, D) row *including padded positions* — the flax
GroupNorm does not mask either, so padded-region contributions (the
depthwise conv smears valid frames into padding) are reproduced
bit-for-bit in spirit; see tests/test_fused_convmodule.py for the
allclose bounds.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _forward_row(x, mask, w1, b1, dw, bdw, gscale, gbias, w2, b2, eps):
    """One (T, D) row through the module; returns intermediates for bwd.

    All math mirrors layers/convolution.py's unfused path. 1-D
    parameters arrive as (1, n) rows (Mosaic-friendly 2-D refs).
    """
    b1 = b1.reshape(-1)
    bdw = bdw.reshape(-1)
    gscale = gscale.reshape(-1)
    gbias = gbias.reshape(-1)
    b2 = b2.reshape(-1)
    t, d = x.shape
    k = dw.shape[0]
    pad_l = k // 2
    pad_r = k - 1 - pad_l

    xm = x * mask[:, None]
    h2 = jax.lax.dot_general(
        xm, w1, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) + b1.astype(jnp.float32)
    a = h2[:, :d]
    g = h2[:, d:]
    sg = jax.nn.sigmoid(g)
    h = (a * sg) * mask[:, None]  # GLU then re-mask

    hp = jnp.pad(h, ((pad_l, pad_r), (0, 0)))
    c = jnp.zeros((t, d), jnp.float32)
    for j in range(k):
        c = c + dw[j].astype(jnp.float32) * hp[j : j + t]
    c = c + bdw.astype(jnp.float32)

    mu = jnp.mean(c)
    var = jnp.mean(jnp.square(c)) - jnp.square(mu)
    rstd = jax.lax.rsqrt(var + eps)
    chat = (c - mu) * rstd
    gn = gscale.astype(jnp.float32) * chat + gbias.astype(jnp.float32)
    ssig = jax.nn.sigmoid(gn)
    s = gn * ssig  # swish

    out = jax.lax.dot_general(
        s.astype(x.dtype), w2, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2.astype(jnp.float32)
    out = out * mask[:, None]
    return out, (xm, a, g, sg, h, chat, rstd, gn, ssig, s)


def _fwd_kernel(eps, x_ref, m_ref, w1_ref, b1_ref, dw_ref, bdw_ref,
                gs_ref, gb_ref, w2_ref, b2_ref, o_ref):
    x = x_ref[0]
    mask = m_ref[pl.program_id(0)].astype(jnp.float32)
    out, _ = _forward_row(
        x, mask.astype(x.dtype), w1_ref[...], b1_ref[...], dw_ref[...],
        bdw_ref[...], gs_ref[...], gb_ref[...], w2_ref[...], b2_ref[...],
        eps,
    )
    o_ref[0] = out.astype(o_ref.dtype)


def _bwd_kernel(eps, x_ref, m_ref, w1_ref, b1_ref, dw_ref, bdw_ref,
                gs_ref, gb_ref, w2_ref, b2_ref, do_ref,
                dx_ref, dw1_ref, db1_ref, ddw_ref, dbdw_ref,
                dgs_ref, dgb_ref, dw2_ref, db2_ref):
    x = x_ref[0]
    maskf = m_ref[pl.program_id(0)].astype(jnp.float32)
    mask = maskf  # (T,)
    t, d = x.shape
    k = dw_ref.shape[0]
    pad_l = k // 2
    pad_r = k - 1 - pad_l

    _, saved = _forward_row(
        x, mask.astype(x.dtype), w1_ref[...], b1_ref[...], dw_ref[...],
        bdw_ref[...], gs_ref[...], gb_ref[...], w2_ref[...], b2_ref[...],
        eps,
    )
    xm, a, g, sg, h, chat, rstd, gn, ssig, s = saved

    do = do_ref[0].astype(jnp.float32) * mask[:, None]

    # pw2 backward
    ds = jax.lax.dot_general(
        do.astype(x.dtype), w2_ref[...].T, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dw2 = jax.lax.dot_general(
        s.astype(x.dtype).T, do.astype(x.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db2 = jnp.sum(do, axis=0)[None]

    # swish backward: d/dgn gn*sig(gn) = sig + gn*sig*(1-sig)
    dgn = ds * (ssig + gn * ssig * (1.0 - ssig))

    # GroupNorm(1) backward over the whole (T, D) row
    gscale = gs_ref[...].reshape(-1).astype(jnp.float32)
    dchat = dgn * gscale
    dgs = jnp.sum(dgn * chat, axis=0)[None]
    dgb = jnp.sum(dgn, axis=0)[None]
    m1 = jnp.mean(dchat)
    m2 = jnp.mean(dchat * chat)
    dc = (dchat - m1 - chat * m2) * rstd

    # depthwise backward: ddw[j] = Σ_t dc[t]·h[t+j-pad]; dh via correlation
    hp = jnp.pad(h, ((pad_l, pad_r), (0, 0)))
    dcp = jnp.pad(dc, ((pad_r, pad_l), (0, 0)))  # transposed conv padding
    dh = jnp.zeros((t, d), jnp.float32)
    dwf = dw_ref[...].astype(jnp.float32)
    ddw_rows = []
    for j in range(k):
        ddw_rows.append(jnp.sum(dc * hp[j : j + t], axis=0))
        dh = dh + dwf[k - 1 - j] * dcp[j : j + t]
    ddw = jnp.stack(ddw_rows)
    dbdw = jnp.sum(dc, axis=0)[None]
    dh = dh * mask[:, None]  # GLU-output mask

    # GLU backward: h = a·sig(g)
    da = dh * sg
    dg = dh * a * sg * (1.0 - sg)
    dh2 = jnp.concatenate([da, dg], axis=1)

    # pw1 backward
    dxm = jax.lax.dot_general(
        dh2.astype(x.dtype), w1_ref[...].T, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dw1 = jax.lax.dot_general(
        xm.astype(x.dtype).T, dh2.astype(x.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db1 = jnp.sum(dh2, axis=0)[None]
    dx = dxm * mask[:, None]

    dx_ref[0] = dx.astype(dx_ref.dtype)

    first = pl.program_id(0) == 0

    @pl.when(first)
    def _init():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        ddw_ref[...] = jnp.zeros_like(ddw_ref)
        dbdw_ref[...] = jnp.zeros_like(dbdw_ref)
        dgs_ref[...] = jnp.zeros_like(dgs_ref)
        dgb_ref[...] = jnp.zeros_like(dgb_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    dw1_ref[...] += dw1
    db1_ref[...] += db1
    ddw_ref[...] += ddw
    dbdw_ref[...] += dbdw
    dgs_ref[...] += dgs
    dgb_ref[...] += dgb
    dw2_ref[...] += dw2
    db2_ref[...] += db2


def _row_specs(b, t, d, k):
    """BlockSpecs: per-row x/out blocks; whole-array mask + weights.

    The mask rides as the FULL (B, T) array: Mosaic requires the last
    two block dims be (8·n, 128·n) or equal to the array dims, so a
    (1, T) per-row mask block cannot lower (second-minor 1) — the
    kernels select their row with pl.program_id instead (found by the
    r5 real-chip compile probe; interpret mode does not check this)."""
    row = pl.BlockSpec((1, t, d), lambda i: (i, 0, 0))
    mrow = pl.BlockSpec((b, t), lambda i: (0, 0))
    whole = lambda *shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape))
    return row, mrow, whole


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11))
def fused_conv_module(x, mask, w1, b1, dw, bdw, gscale, gbias, w2, b2,
                      eps=1e-6, interpret=False):
    """(B, T, D) × (B, T) mask → (B, T, D); see module docstring."""
    out, _ = _fused_fwd(
        x, mask, w1, b1, dw, bdw, gscale, gbias, w2, b2, eps, interpret
    )
    return out


def _fused_fwd(x, mask, w1, b1, dw, bdw, gscale, gbias, w2, b2, eps,
               interpret=False):
    b, t, d = x.shape
    k = dw.shape[0]
    row, mrow, whole = _row_specs(b, t, d, k)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, eps),
        grid=(b,),
        in_specs=[
            row, mrow,
            whole(d, 2 * d), whole(1, 2 * d), whole(k, d), whole(1, d),
            whole(1, d), whole(1, d), whole(d, d), whole(1, d),
        ],
        out_specs=row,
        out_shape=jax.ShapeDtypeStruct((b, t, d), x.dtype),
        interpret=interpret,
    )(x, mask.astype(jnp.float32), w1, b1[None], dw, bdw[None],
      gscale[None], gbias[None], w2, b2[None])
    return out, (x, mask, w1, b1, dw, bdw, gscale, gbias, w2, b2)


def _fused_vjp_fwd(x, mask, w1, b1, dw, bdw, gscale, gbias, w2, b2, eps,
                   interpret):
    return _fused_fwd(
        x, mask, w1, b1, dw, bdw, gscale, gbias, w2, b2, eps, interpret
    )


def _fused_vjp_bwd(eps, interpret, res, do):
    x, mask, w1, b1, dw, bdw, gscale, gbias, w2, b2 = res
    b, t, d = x.shape
    k = dw.shape[0]
    row, mrow, whole = _row_specs(b, t, d, k)
    f32 = jnp.float32
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, eps),
        grid=(b,),
        in_specs=[
            row, mrow,
            whole(d, 2 * d), whole(1, 2 * d), whole(k, d), whole(1, d),
            whole(1, d), whole(1, d), whole(d, d), whole(1, d),
            row,
        ],
        out_specs=[
            row,
            whole(d, 2 * d), whole(1, 2 * d), whole(k, d), whole(1, d),
            whole(1, d), whole(1, d), whole(d, d), whole(1, d),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, t, d), x.dtype),
            jax.ShapeDtypeStruct((d, 2 * d), f32),
            jax.ShapeDtypeStruct((1, 2 * d), f32),
            jax.ShapeDtypeStruct((k, d), f32),
            jax.ShapeDtypeStruct((1, d), f32),
            jax.ShapeDtypeStruct((1, d), f32),
            jax.ShapeDtypeStruct((1, d), f32),
            jax.ShapeDtypeStruct((d, d), f32),
            jax.ShapeDtypeStruct((1, d), f32),
        ],
        interpret=interpret,
    )(x, mask.astype(jnp.float32), w1, b1[None], dw, bdw[None],
      gscale[None], gbias[None], w2, b2[None], do)
    dx, dw1, db1, ddw, dbdw, dgs, dgb, dw2, db2 = outs
    db1, dbdw, dgs, dgb, db2 = (
        db1[0], dbdw[0], dgs[0], dgb[0], db2[0]
    )
    return (
        dx,
        None,  # mask
        dw1.astype(w1.dtype), db1.astype(b1.dtype),
        ddw.astype(dw.dtype), dbdw.astype(bdw.dtype),
        dgs.astype(gscale.dtype), dgb.astype(gbias.dtype),
        dw2.astype(w2.dtype), db2.astype(b2.dtype),
    )


fused_conv_module.defvjp(_fused_vjp_fwd, _fused_vjp_bwd)


def reference_conv_module(x, mask, w1, b1, dw, bdw, gscale, gbias, w2, b2,
                          eps=1e-6):
    """Unfused XLA formulation with identical math — the correctness
    oracle and the non-TPU fallback."""
    xm = x * mask[:, :, None].astype(x.dtype)
    h2 = jnp.einsum("btd,de->bte", xm, w1).astype(jnp.float32) + b1
    d = x.shape[-1]
    h = (h2[..., :d] * jax.nn.sigmoid(h2[..., d:]))
    h = h * mask[:, :, None]
    k = dw.shape[0]
    pad_l = k // 2
    hp = jnp.pad(h, ((0, 0), (pad_l, k - 1 - pad_l), (0, 0)))
    t = x.shape[1]
    c = jnp.zeros_like(h)
    for j in range(k):
        c = c + dw[j].astype(jnp.float32) * hp[:, j : j + t]
    c = c + bdw
    mu = jnp.mean(c, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(c), axis=(1, 2), keepdims=True) - jnp.square(mu)
    chat = (c - mu) * jax.lax.rsqrt(var + eps)
    gn = gscale * chat + gbias
    s = gn * jax.nn.sigmoid(gn)
    out = jnp.einsum("btd,de->bte", s.astype(x.dtype), w2).astype(jnp.float32) + b2
    return (out * mask[:, :, None]).astype(x.dtype)
