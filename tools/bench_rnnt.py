"""TPU benchmark: Pallas RNN-T kernel vs the lax.scan lattice.

Times forward+backward through the pre-gathered log-prob API at a
Librispeech-ish shape, checks numerics on device, prints a JSON line.
Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_rnnt.py
"""
from __future__ import annotations

import json
import time

import numpy as np


def time_fn(f, *args, iters=30):
    from espnet_tpu.utils.timing import force

    out = f(*args)
    force(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    force(out)  # host readback: block_until_ready lies under the tunnel
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from espnet_tpu.losses.pallas_rnnt import rnnt_loss_pallas
    from espnet_tpu.losses.transducer import rnnt_loss_from_log_probs

    b, t, u = 32, 256, 64
    rng = np.random.RandomState(0)
    lp_blank = jnp.asarray(rng.randn(b, t, u + 1).astype(np.float32) - 1.0)
    lp_emit = jnp.asarray(rng.randn(b, t, u).astype(np.float32) - 1.0)
    ilens = jnp.asarray(
        rng.randint(t // 2, t + 1, size=(b,)).astype(np.int32)
    )
    llens = jnp.asarray(rng.randint(u // 2, u + 1, size=(b,)).astype(np.int32))

    def loss_scan(lpb, lpe):
        return rnnt_loss_from_log_probs(lpb, lpe, ilens, llens).sum()

    def loss_pallas(lpb, lpe):
        return rnnt_loss_pallas(lpb, lpe, ilens, llens).sum()

    fwd_scan = jax.jit(loss_scan)
    fwd_pallas = jax.jit(loss_pallas)
    g_scan = jax.jit(jax.grad(loss_scan, argnums=(0, 1)))
    g_pallas = jax.jit(jax.grad(loss_pallas, argnums=(0, 1)))

    # numerics on device
    a = float(fwd_scan(lp_blank, lp_emit))
    p = float(fwd_pallas(lp_blank, lp_emit))
    rel = abs(a - p) / max(abs(a), 1)
    gs = g_scan(lp_blank, lp_emit)
    gp = g_pallas(lp_blank, lp_emit)
    gerr = max(
        float(jnp.max(jnp.abs(gs[0] - gp[0]))),
        float(jnp.max(jnp.abs(gs[1] - gp[1]))),
    )

    t_fs = time_fn(fwd_scan, lp_blank, lp_emit)
    t_fp = time_fn(fwd_pallas, lp_blank, lp_emit)
    t_gs = time_fn(g_scan, lp_blank, lp_emit)
    t_gp = time_fn(g_pallas, lp_blank, lp_emit)

    print(
        json.dumps(
            {
                "shape": [b, t, u],
                "loss_rel_err": rel,
                "grad_max_abs_err": gerr,
                "fwd_scan_ms": round(t_fs * 1e3, 3),
                "fwd_pallas_ms": round(t_fp * 1e3, 3),
                "fwdbwd_scan_ms": round(t_gs * 1e3, 3),
                "fwdbwd_pallas_ms": round(t_gp * 1e3, 3),
                "fwd_speedup": round(t_fs / t_fp, 2),
                "fwdbwd_speedup": round(t_gs / t_gp, 2),
                "backend": jax.devices()[0].platform,
            }
        )
    )


if __name__ == "__main__":
    main()
