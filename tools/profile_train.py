"""Capture a jax profiler trace of the flagship train step
(view with TensorBoard / xprof; SURVEY §5 'tracing/profiling' parity —
the reference only has wall-clock phase timers).

Usage: python tools/profile_train.py [outdir] [batch]
"""
from __future__ import annotations

import sys


def main(outdir: str = "/tmp/jax_trace", batch: int = 32):
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    import __graft_entry__ as g
    from espnet_tpu.train.optimizers import build_optimizer
    from espnet_tpu.train.train_state import TrainState, make_train_step

    vocab = 500
    model = g._flagship(vocab, dtype=jnp.bfloat16)
    feats, ilens, ys, ylens = g._example_batch(b=batch, t=512, d=80, l=24, vocab=vocab)
    variables = model.init(
        jax.random.PRNGKey(0), feats[:1], ilens[:1], ys[:1], ylens[:1]
    )
    tx = build_optimizer("adam", lr=1e-4)
    state = TrainState.create(variables["params"], tx, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(model, tx), donate_argnums=0)
    batch_d = {
        "speech": jnp.asarray(feats),
        "speech_lengths": jnp.asarray(ilens),
        "text": jnp.asarray(ys),
        "text_lengths": jnp.asarray(ylens),
    }
    for _ in range(3):  # warmup/compile
        state, stats = step(state, batch_d)
    jax.block_until_ready(stats["loss"])
    with jax.profiler.trace(outdir):
        for _ in range(5):
            state, stats = step(state, batch_d)
        jax.block_until_ready(stats["loss"])
    print(f"trace written to {outdir}")


if __name__ == "__main__":
    args = sys.argv[1:]
    main(*(args[:1] + [int(a) for a in args[1:2]]))
