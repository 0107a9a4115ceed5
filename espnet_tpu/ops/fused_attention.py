"""Fused multi-head self-attention Pallas kernel (TPU).

Replaces the XLA decomposition (scores matmul → mask → softmax → attn
matmul) used by MultiHeadedAttention / RelPositionMultiHeadedAttention
(espnet/nets/pytorch_backend/transformer/attention.py:16,117) for the
training hot path. The (B, H, Tq, Tk) score/probability tensors never
touch HBM:

- forward: one grid cell per batch row with a static unrolled head
  loop; QK^T, additive bias (rel-pos matrix_bd) and additive key mask,
  f32 softmax, and the probs·V matmul all happen on VMEM-resident
  (Tq, Tk) tiles.
- backward (jax.custom_vjp): recomputes the probabilities from the
  saved q/k/bias (flash-attention-style recompute — cheaper than
  storing them) and produces dq/dk/dv/dbias in the same fused cell.

The rel-pos bias is computed OUTSIDE the kernel by the one-hot
contraction in layers/attention.py (an MXU einsum XLA handles well);
the kernel owns only the score-space elementwise work, which is where
the HBM round trips were.

Layout note: Mosaic supports only leading-dim squeezes on loads/
stores, so the (B, T, H, D) model layout is transposed to (B, H, T, D)
at the kernel boundary (one cheap XLA transpose each way); blocks are
(1, H, T, D) and heads are indexed at a leading position.

Not used when attention dropout is active or attention maps are
requested for plotting — callers fall back to the XLA path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

MASK_MIN = -1.0e9

# module-level interpret switch so CPU tests can exercise the kernel
# through the attention layers without threading a flag down
INTERPRET = False


def _attn_probs(q, k, bias_h, mask_row):
    """(Tq,D),(Tk,D),bias (Tq,Tk) or None, mask (1,Tk) → f32 probs."""
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if bias_h is not None:
        s = s + bias_h.astype(jnp.float32)
    s = s + mask_row
    return jax.nn.softmax(s, axis=-1)


def _fwd_kernel(has_bias, q_ref, k_ref, v_ref, bias_ref, mask_ref, o_ref):
    n_head = q_ref.shape[1]
    for h in range(n_head):
        q = q_ref[0, h]  # (Tq, D)
        k = k_ref[0, h]  # (Tk, D)
        v = v_ref[0, h]  # (Tk, D)
        p = _attn_probs(q, k, bias_ref[0, h] if has_bias else None, mask_ref[0])
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, h] = o.astype(o_ref.dtype)


def _bwd_kernel(has_bias, q_ref, k_ref, v_ref, bias_ref, mask_ref, do_ref,
                dq_ref, dk_ref, dv_ref, dbias_ref):
    n_head = q_ref.shape[1]
    for h in range(n_head):
        q = q_ref[0, h]
        k = k_ref[0, h]
        v = v_ref[0, h]
        do = do_ref[0, h]
        p = _attn_probs(q, k, bias_ref[0, h] if has_bias else None, mask_ref[0])
        pc = p.astype(v.dtype)
        # dV = P^T dO ; dP = dO V^T ; dS = P ⊙ (dP − rowsum(dP ⊙ P))
        dv = jax.lax.dot_general(
            pc, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dsc = ds.astype(q.dtype)
        dq = jax.lax.dot_general(
            dsc, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dk = jax.lax.dot_general(
            dsc, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dq_ref[0, h] = dq.astype(dq_ref.dtype)
        dk_ref[0, h] = dk.astype(dk_ref.dtype)
        dv_ref[0, h] = dv.astype(dv_ref.dtype)
        if has_bias:
            dbias_ref[0, h] = ds.astype(dbias_ref.dtype)


def _fwd_kernel_nobias(q_ref, k_ref, v_ref, mask_ref, o_ref):
    _fwd_kernel(False, q_ref, k_ref, v_ref, None, mask_ref, o_ref)


def _bwd_kernel_nobias(q_ref, k_ref, v_ref, mask_ref, do_ref,
                       dq_ref, dk_ref, dv_ref):
    _bwd_kernel(False, q_ref, k_ref, v_ref, None, mask_ref, do_ref,
                dq_ref, dk_ref, dv_ref, None)


def _specs(h, tq, tk, d):
    qspec = pl.BlockSpec((1, h, tq, d), lambda i: (i, 0, 0, 0))
    kspec = pl.BlockSpec((1, h, tk, d), lambda i: (i, 0, 0, 0))
    bspec = pl.BlockSpec((1, h, tq, tk), lambda i: (i, 0, 0, 0))
    mspec = pl.BlockSpec((1, 1, tk), lambda i: (i, 0, 0))
    return qspec, kspec, bspec, mspec


def _bthd_to_bhtd(x):
    return jnp.transpose(x, (0, 2, 1, 3))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_attention(q, k, v, bias, mask_add, interpret=False):
    """Fused softmax(q k^T [+ bias] + mask_add) v.

    q, k, v: (B, T{q,k}, H, D); q pre-scaled (1/sqrt(D) and +pos_bias
    folded in by the caller). bias: (B, H, Tq, Tk) additive score bias
    (rel-pos matrix_bd) or None for vanilla MHA. mask_add: (B, Tk) f32,
    0 for attend / MASK_MIN for padding. Returns (B, Tq, H, D) in
    q.dtype.
    """
    out, _ = _fused_fwd(q, k, v, bias, mask_add, interpret)
    return out


def _fused_fwd(q, k, v, bias, mask_add, interpret):
    interpret = interpret or INTERPRET
    b, tq, h, d = q.shape
    tk = k.shape[1]
    qspec, kspec, bspec, mspec = _specs(h, tq, tk, d)
    qt, kt, vt = _bthd_to_bhtd(q), _bthd_to_bhtd(k), _bthd_to_bhtd(v)
    mask3 = mask_add.reshape(b, 1, tk)
    out_shape = jax.ShapeDtypeStruct((b, h, tq, d), q.dtype)
    if bias is None:
        out = pl.pallas_call(
            _fwd_kernel_nobias,
            grid=(b,),
            in_specs=[qspec, kspec, kspec, mspec],
            out_specs=qspec,
            out_shape=out_shape,
            interpret=interpret,
        )(qt, kt, vt, mask3)
    else:
        out = pl.pallas_call(
            functools.partial(_fwd_kernel, True),
            grid=(b,),
            in_specs=[qspec, kspec, kspec, bspec, mspec],
            out_specs=qspec,
            out_shape=out_shape,
            interpret=interpret,
        )(qt, kt, vt, bias, mask3)
    return _bthd_to_bhtd(out), (q, k, v, bias, mask_add)


def _fused_bwd(interpret, res, g):
    interpret = interpret or INTERPRET
    q, k, v, bias, mask_add = res
    b, tq, h, d = q.shape
    tk = k.shape[1]
    qspec, kspec, bspec, mspec = _specs(h, tq, tk, d)
    qt, kt, vt = _bthd_to_bhtd(q), _bthd_to_bhtd(k), _bthd_to_bhtd(v)
    gt = _bthd_to_bhtd(g.astype(q.dtype))
    mask3 = mask_add.reshape(b, 1, tk)
    shapes = [
        jax.ShapeDtypeStruct((b, h, tq, d), q.dtype),
        jax.ShapeDtypeStruct((b, h, tk, d), k.dtype),
        jax.ShapeDtypeStruct((b, h, tk, d), v.dtype),
    ]
    if bias is None:
        dq, dk, dv = pl.pallas_call(
            _bwd_kernel_nobias,
            grid=(b,),
            in_specs=[qspec, kspec, kspec, mspec, qspec],
            out_specs=[qspec, kspec, kspec],
            out_shape=shapes,
            interpret=interpret,
        )(qt, kt, vt, mask3, gt)
        dbias = None
    else:
        dq, dk, dv, dbias = pl.pallas_call(
            functools.partial(_bwd_kernel, True),
            grid=(b,),
            in_specs=[qspec, kspec, kspec, bspec, mspec, qspec],
            out_specs=[qspec, kspec, kspec, bspec],
            out_shape=shapes + [jax.ShapeDtypeStruct(bias.shape, bias.dtype)],
            interpret=interpret,
        )(qt, kt, vt, bias, mask3, gt)
    return (
        _bthd_to_bhtd(dq),
        _bthd_to_bhtd(dk),
        _bthd_to_bhtd(dv),
        dbias,
        None,
    )


fused_attention.defvjp(_fused_fwd, _fused_bwd)
