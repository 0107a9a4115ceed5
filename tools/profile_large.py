"""Profile the reference-large conformer (d=512, h=8, 12L, ff=2048 —
SURVEY A.4 north-star) on the real chip: full train-step at several
batch sizes + encoder-only component ablations, so the d=512 MFU gap
can be attributed (VERDICT r3 next-round #3).

Honest device->host readback timing (utils/timing.force).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_large.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK = 197e12  # v5e bf16 peak


def _timeit(f, *args, n=10):
    from espnet_tpu.utils.timing import force

    out = f(*args)
    force(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    force(out)
    return (time.perf_counter() - t0) / n


def train_step_flops(n_params, b, t_enc, l_dec):
    # 6ND convention: fwd+bwd ≈ 6 * params * tokens; encoder tokens
    # dominate (t_enc/4 after subsampling) + decoder l_dec
    return 6 * n_params * (b * (t_enc // 4 + l_dec))


def bench_train(b=32, t=512, l=24):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from espnet_tpu.models.asr import (
        ASRModel,
        ConformerEncoder,
        TransformerDecoder,
    )
    from espnet_tpu.train.optimizers import build_optimizer
    from espnet_tpu.train.train_state import TrainState, make_train_step

    vocab = 5000
    enc = ConformerEncoder(
        attention_dim=512, attention_heads=8, linear_units=2048,
        num_blocks=12, dtype=jnp.bfloat16,
    )
    dec = TransformerDecoder(
        vocab, attention_dim=512, attention_heads=8, linear_units=2048,
        num_blocks=6, dtype=jnp.bfloat16,
    )
    model = ASRModel(
        vocab_size=vocab, encoder=enc, decoder=dec, ctc_weight=0.3,
        lsm_weight=0.1, dtype=jnp.bfloat16,
    )
    rng = np.random.RandomState(0)
    feats = rng.randn(b, t, 80).astype(np.float32)
    ilens = np.full(b, t, np.int32)
    ys = rng.randint(1, vocab - 1, size=(b, l)).astype(np.int32)
    ylens = np.full(b, l, np.int32)
    variables = model.init(
        jax.random.PRNGKey(0), feats[:1], ilens[:1], ys[:1], ylens[:1]
    )
    n_params = sum(
        int(np.prod(x.shape))
        for x in jax.tree_util.tree_leaves(variables["params"])
    )
    tx = build_optimizer("adam", lr=1e-4)
    state = TrainState.create(variables["params"], tx, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(model, tx), donate_argnums=0)
    batch = {
        "speech": jnp.asarray(feats),
        "speech_lengths": jnp.asarray(ilens),
        "text": jnp.asarray(ys),
        "text_lengths": jnp.asarray(ylens),
    }

    def run(s, bt):
        s2, stats = step(s, bt)
        return s2, stats

    state, stats = step(state, batch)
    state, stats = step(state, batch)
    from espnet_tpu.utils.timing import force

    force(stats["loss"])
    n_steps = 10
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, stats = step(state, batch)
    force(stats["loss"])
    dt = (time.perf_counter() - t0) / n_steps
    fl = train_step_flops(n_params, b, t, l)
    mfu = fl / dt / PEAK * 100
    audio = b * (t / 100.0) / dt
    print(
        f"train b={b} t={t}: step {dt*1e3:.1f} ms  {audio:,.0f} audio-s/s  "
        f"MFU {mfu:.1f}%  (params {n_params/1e6:.1f}M)",
        flush=True,
    )
    return dt


def bench_encoder_ablation(b=32, t=512):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from espnet_tpu.models.asr import ConformerEncoder

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, t, 80).astype(np.float32))
    xl = jnp.asarray(np.full(b, t, np.int32))

    variants = {
        "full": dict(),
        "no conv module": dict(use_cnn=False),
        "no macaron": dict(use_macaron=False),
        "cnn_kernel=7": dict(cnn_kernel=7),
        "input linear (no conv2d sub)": dict(input_layer="linear"),
    }
    for name, kw in variants.items():
        try:
            model = ConformerEncoder(
                attention_dim=512, attention_heads=8, linear_units=2048,
                num_blocks=12, dtype=jnp.bfloat16, **kw,
            )
            variables = model.init(jax.random.PRNGKey(0), x[:1], xl[:1])

            @jax.jit
            def fwd(v, x, xl):
                hs, hl = model.apply(v, x, xl, deterministic=True)
                return jnp.sum(hs.astype(jnp.float32))

            @jax.jit
            def fwdbwd(v, x, xl):
                def loss(v):
                    hs, _ = model.apply(v, x, xl, deterministic=True)
                    return jnp.sum(hs.astype(jnp.float32))

                return jax.value_and_grad(loss)(v)

            tf = _timeit(fwd, variables, x, xl)
            tb = _timeit(lambda v, a, b2: fwdbwd(v, a, b2)[0], variables, x, xl)
            print(f"enc[{name:24s}] fwd {tf*1e3:6.1f} ms  fwd+bwd {tb*1e3:6.1f} ms",
                  flush=True)
        except Exception as e:
            print(f"enc[{name}] ERROR {str(e)[:120]}", flush=True)


def main():
    from espnet_tpu.utils.env import apply_jax_platform_env, enable_fast_tpu_rng
    from espnet_tpu.utils.device_journal import journal_device_use

    apply_jax_platform_env()
    journal_device_use("profile_large")
    enable_fast_tpu_rng()
    for b in (32, 48, 64):
        try:
            bench_train(b=b)
        except Exception as e:
            print(f"train b={b} ERROR {str(e)[:200]}", flush=True)
    bench_encoder_ablation()


if __name__ == "__main__":
    main()
