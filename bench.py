"""Benchmark: Conformer hybrid CTC/attention training throughput on one
chip, reported as audio-seconds of speech processed per wall-second.

Prints ONE json line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no throughput numbers (BASELINE.md), so
vs_baseline is the real-time factor (audio-seconds/s ÷ 1.0), i.e. how
many times faster than real time training runs on a single chip.
"""
from __future__ import annotations

import json
import time

import numpy as np

FPS = 100.0  # feature frames per audio second (10 ms shift convention)


def main():
    import jax

    import __graft_entry__ as g
    from espnet_tpu.train.optimizers import build_optimizer
    from espnet_tpu.train.train_state import TrainState, make_train_step

    import jax.numpy as jnp

    vocab = 500
    b, t, l = 128, 512, 24
    model = g._flagship(vocab, dtype=jnp.bfloat16)
    feats, ilens, ys, ylens = g._example_batch(b=b, t=t, d=80, l=l, vocab=vocab)
    variables = model.init(
        jax.random.PRNGKey(0), feats[:1], ilens[:1], ys[:1], ylens[:1]
    )
    tx = build_optimizer("adam", lr=1e-4)
    state = TrainState.create(variables["params"], tx, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(model, tx), donate_argnums=0)

    batch = {
        "speech": jax.numpy.asarray(feats),
        "speech_lengths": jax.numpy.asarray(ilens),
        "text": jax.numpy.asarray(ys),
        "text_lengths": jax.numpy.asarray(ylens),
    }

    # warmup (compile)
    for _ in range(3):
        state, stats = step(state, batch)
    jax.block_until_ready(stats["loss"])

    n_steps = 10
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, stats = step(state, batch)
    jax.block_until_ready(stats["loss"])
    dt = time.perf_counter() - t0

    audio_seconds = n_steps * b * t / FPS
    value = audio_seconds / dt
    n_chips = max(jax.device_count(), 1)
    per_chip = value / n_chips
    print(
        json.dumps(
            {
                "metric": "conformer_train_throughput_audio_sec_per_s_per_chip",
                "value": round(per_chip, 2),
                "unit": "audio-seconds/s/chip",
                "vs_baseline": round(per_chip, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
