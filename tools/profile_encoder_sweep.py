"""Attribute the Conformer encoder's backward cost by component.

Times encoder-only fwd and fwd+bwd for ablated variants (no conv module,
no macaron, linear input layer, vanilla attention) so the MFU gap from
docs/BENCHMARKS.md can be pinned to a block. Honest device->host
readback timing (utils/timing.force).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_encoder_sweep.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timeit(f, *args, n=10):
    from espnet_tpu.utils.timing import force

    out = f(*args)
    force(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    force(out)
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from espnet_tpu.models.asr import ConformerEncoder, TransformerEncoder
    from espnet_tpu.utils.env import enable_fast_tpu_rng

    enable_fast_tpu_rng()
    b, t, d = 128, 512, 80
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(b, t, d).astype(np.float32))
    ilens = jnp.asarray(np.full(b, t, np.int32))

    variants = {
        "full conformer": dict(),
        "no conv module": dict(use_cnn=False),
        "no macaron": dict(use_macaron=False),
        "no conv, no macaron": dict(use_cnn=False, use_macaron=False),
        "cnn_kernel=7": dict(cnn_kernel=7),
    }

    def bench(name, make_model, x, xl):
        model = make_model()
        variables = model.init(jax.random.PRNGKey(0), x[:1], xl[:1])

        @jax.jit
        def fwd(v, x, xl):
            hs, hl = model.apply(v, x, xl, deterministic=True)
            return jnp.sum(hs.astype(jnp.float32))

        g = jax.jit(jax.grad(lambda v, x, xl: fwd(v, x, xl)))
        tf = _timeit(fwd, variables, x, xl)
        tg = _timeit(g, variables, x, xl)
        print(f"{name:28s} fwd {tf*1e3:7.2f} ms   fwd+bwd {tg*1e3:7.2f} ms   "
              f"ratio {tg/tf:4.2f}")
        return tf, tg

    base = dict(
        attention_dim=256, attention_heads=4, linear_units=1024, num_blocks=12,
        dtype=jnp.bfloat16,
    )
    for name, kw in variants.items():
        bench(name, lambda kw=kw: ConformerEncoder(**{**base, **kw}), feats, ilens)

    # linear input on pre-subsampled length isolates Conv2dSubsampling
    feats128 = jnp.asarray(rng.randn(b, t // 4, 256).astype(np.float32))
    ilens128 = jnp.asarray(np.full(b, t // 4, np.int32))
    bench(
        "linear input (T=128 pre-sub)",
        lambda: ConformerEncoder(**base, input_layer="linear"),
        feats128, ilens128,
    )
    bench(
        "vanilla transformer enc",
        lambda: TransformerEncoder(
            attention_dim=256, attention_heads=4, linear_units=1024,
            num_blocks=12, dtype=jnp.bfloat16,
        ),
        feats, ilens,
    )


if __name__ == "__main__":
    main()
