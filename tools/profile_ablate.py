"""Component-level ablation timing of the flagship train step.

Times each piece of the Conformer hybrid CTC/attention train step in
isolation on the real device (honest device->host readback timing, see
utils/timing.py) so the MFU gap can be attributed: encoder fwd/bwd,
decoder, CTC (Pallas), dropout cost, optimizer update.

Usage: python tools/profile_ablate.py [--batch 128] [--frames 512]
"""
from __future__ import annotations

import argparse
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--frames", type=int, default=512)
    ap.add_argument("--labels", type=int, default=24)
    ap.add_argument("--n", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import __graft_entry__ as g
    from espnet_tpu.losses.label_smoothing import label_smoothing_loss
    from espnet_tpu.models.asr.espnet_model import add_sos_eos
    from espnet_tpu.train.optimizers import build_optimizer
    from espnet_tpu.train.train_state import TrainState, make_train_step
    from espnet_tpu.utils.env import enable_fast_tpu_rng

    enable_fast_tpu_rng()
    vocab = 500
    b, t, l = args.batch, args.frames, args.labels
    model = g._flagship(vocab, dtype=jnp.bfloat16)
    feats, ilens, ys, ylens = g._example_batch(b=b, t=t, d=80, l=l, vocab=vocab)
    feats = jnp.asarray(feats)
    ilens = jnp.asarray(ilens)
    ys = jnp.asarray(ys)
    ylens = jnp.asarray(ylens)
    variables = model.init(
        jax.random.PRNGKey(0), feats[:1], ilens[:1], ys[:1], ylens[:1]
    )
    params = variables["params"]
    rngs = {"dropout": jax.random.PRNGKey(1), "specaug": jax.random.PRNGKey(2)}

    # --- full train step (fwd + bwd + optimizer), as bench.py times it
    tx = build_optimizer("adam", lr=1e-4)
    state = TrainState.create(
        jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), params),
        tx,
        jax.random.PRNGKey(0),
    )
    step = jax.jit(make_train_step(model, tx), donate_argnums=0)
    batch = {
        "speech": feats,
        "speech_lengths": ilens,
        "text": ys,
        "text_lengths": ylens,
    }

    def run_step(s):
        nonlocal state
        for _ in range(1):
            state, stats = step(state, batch)
        return stats["loss"]

    from espnet_tpu.utils.timing import force

    state, stats = step(state, batch)
    force(stats["loss"])
    t0 = time.perf_counter()
    for _ in range(args.n):
        state, stats = step(state, batch)
    force(stats["loss"])
    t_full = (time.perf_counter() - t0) / args.n

    # --- value+grad only (no optimizer update)
    def loss_fn(p, d=False):
        loss, _ = model.apply(
            {"params": p}, feats, ilens, ys, ylens, deterministic=d, rngs=rngs
        )
        return loss

    vg = jax.jit(jax.value_and_grad(lambda p: loss_fn(p)))
    t_grad = _timeit(vg, params, n=args.n)

    # --- forward loss only (train-mode dropout vs deterministic)
    t_fwd = _timeit(jax.jit(lambda p: loss_fn(p, False)), params, n=args.n)
    t_fwd_det = _timeit(jax.jit(lambda p: loss_fn(p, True)), params, n=args.n)

    # --- encoder only
    def enc_fn(p, d=False):
        hs, hlens = model.apply(
            {"params": p},
            feats,
            ilens,
            deterministic=d,
            rngs=rngs,
            method="encode",
        )
        return hs, hlens

    t_enc = _timeit(jax.jit(lambda p: enc_fn(p)[0]), params, n=args.n)
    t_enc_grad = _timeit(
        jax.jit(jax.grad(lambda p: enc_fn(p)[0].astype(jnp.float32).sum())),
        params,
        n=args.n,
    )

    hs, hlens = jax.jit(enc_fn)(params)
    hs = jax.block_until_ready(hs)

    # --- CTC head (Pallas loss) given encoder output
    def ctc_fn(p, h):
        ys_ctc = jnp.where(ys == -1, 0, ys)
        return model.apply(
            {"params": p},
            h,
            hlens,
            ys_ctc,
            ylens,
            method=lambda m, *a: m.ctc(*a, deterministic=False),
            rngs=rngs,
        )

    t_ctc = _timeit(jax.jit(ctc_fn), params, hs, n=args.n)
    t_ctc_grad = _timeit(
        jax.jit(jax.grad(lambda p, h: ctc_fn(p, h), argnums=(0, 1))),
        params,
        hs,
        n=args.n,
    )

    # --- attention decoder + label smoothing given encoder output
    sos = eos = vocab - 1

    def dec_fn(p, h):
        ys_in, ys_out = add_sos_eos(ys, ylens, sos, eos)
        logits = model.apply(
            {"params": p},
            h,
            hlens,
            ys_in,
            ylens + 1,
            method=lambda m, *a: m.decoder(*a, deterministic=False),
            rngs=rngs,
        )
        return label_smoothing_loss(logits, ys_out, smoothing=0.1)

    t_dec = _timeit(jax.jit(dec_fn), params, hs, n=args.n)
    t_dec_grad = _timeit(
        jax.jit(jax.grad(lambda p, h: dec_fn(p, h), argnums=(0, 1))),
        params,
        hs,
        n=args.n,
    )

    # --- optimizer update alone, on real-shaped grads
    _, grads = vg(params)
    grads = jax.block_until_ready(grads)
    opt_state = tx.init(params)

    def opt_fn(gr, os_, p):
        import optax

        updates, os2 = tx.update(gr, os_, p)
        return optax.apply_updates(p, updates)

    t_opt = _timeit(jax.jit(opt_fn), grads, opt_state, params, n=args.n)

    def ms(x):
        return f"{x * 1e3:8.2f} ms"

    def pct(x):
        return f"{x / t_full * 100:5.1f} %"

    print(f"platform: {jax.devices()[0].platform}  b={b} t={t} l={l}")
    rows = [
        ("full train step (fwd+bwd+opt)", t_full),
        ("value_and_grad (no opt)", t_grad),
        ("forward loss (dropout on)", t_fwd),
        ("forward loss (deterministic)", t_fwd_det),
        ("encoder fwd", t_enc),
        ("encoder fwd+bwd", t_enc_grad),
        ("ctc loss fwd (given hs)", t_ctc),
        ("ctc loss fwd+bwd", t_ctc_grad),
        ("decoder+lsm fwd (given hs)", t_dec),
        ("decoder+lsm fwd+bwd", t_dec_grad),
        ("optimizer update alone", t_opt),
    ]
    for name, v in rows:
        print(f"{name:34s} {ms(v)}  {pct(v)}")
    print(
        f"derived: dropout cost {ms(t_fwd - t_fwd_det)}, "
        f"opt overhead in step {ms(t_full - t_grad)}"
    )


if __name__ == "__main__":
    main()
