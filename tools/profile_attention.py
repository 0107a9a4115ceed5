"""Microbenchmark rel-pos vs vanilla MHSA at flagship encoder shapes.

The encoder sweep (profile_encoder_sweep.py) showed rel-pos attention
costs ~10 ms fwd+bwd over vanilla across 12 blocks — far above its FLOP
delta. This isolates one attention layer (B=128, T=128, d=256, h=4) and
times fwd / fwd+bwd for each variant plus ablations of the rel-pos term.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_attention.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timeit(f, *args, n=30):
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

    from espnet_tpu.layers.attention import (
        MultiHeadedAttention,
        RelPositionMultiHeadedAttention,
        rel_shift,
    )
    from espnet_tpu.utils.env import enable_fast_tpu_rng

    enable_fast_tpu_rng()
    b, t, d, h = 128, 128, 256, 4
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, t, d).astype(np.float32))
    pos = jnp.asarray(rng.randn(1, 2 * t - 1, d).astype(np.float32))
    mask = jnp.ones((b, 1, t, t), bool)

    def bench(name, apply_fn, init_args, call_args):
        model, variables = apply_fn(init_args)

        @jax.jit
        def fwd(v, *a):
            return jnp.sum(model.apply(v, *a).astype(jnp.float32))

        g = jax.jit(jax.grad(fwd))
        tf = _timeit(fwd, variables, *call_args)
        tg = _timeit(g, variables, *call_args)
        print(f"{name:34s} fwd {tf*1e3:6.3f} ms   fwd+bwd {tg*1e3:6.3f} ms")
        return tf, tg

    def make(mod, *a):
        variables = mod.init(jax.random.PRNGKey(0), *a)
        return mod, variables

    n_layers = 12

    def stack(mod_fn, *call_sig):
        """12 sequential layers to match the encoder-scale cost."""
        import flax.linen as nn

        class Stack(nn.Module):
            @nn.compact
            def __call__(self, x, *rest):
                for _ in range(n_layers):
                    x = x + mod_fn()(x, x, x, *rest)
                return x

        m = Stack()
        v = m.init(jax.random.PRNGKey(0), x, *call_sig)
        return m, v

    bench(
        "12x vanilla MHSA",
        lambda _: stack(lambda: MultiHeadedAttention(h, d, dtype=jnp.bfloat16), mask),
        None,
        (x, mask),
    )
    bench(
        "12x rel-pos MHSA",
        lambda _: stack(
            lambda: RelPositionMultiHeadedAttention(h, d, dtype=jnp.bfloat16),
            pos,
            mask,
        ),
        None,
        (x, pos, mask),
    )

    # rel_shift alone at score shapes
    s = jnp.asarray(rng.randn(b, h, t, 2 * t - 1).astype(np.float32)).astype(
        jnp.bfloat16
    )

    @jax.jit
    def shift_sum(s):
        out = s
        for _ in range(n_layers):
            out = rel_shift(out)[..., :t]
            out = jnp.pad(out, ((0, 0),) * 3 + ((0, t - 1),))
        return jnp.sum(out.astype(jnp.float32))

    tf = _timeit(shift_sum, s)
    tg = _timeit(jax.jit(jax.grad(shift_sum)), s)
    print(f"{'12x rel_shift only':34s} fwd {tf*1e3:6.3f} ms   fwd+bwd {tg*1e3:6.3f} ms")


if __name__ == "__main__":
    main()
