"""Per-component roofline for the d=256 flagship train step (VERDICT r4
"what's weak" #3): for each fused region, XLA's own FLOP / bytes-accessed
estimates (compiled.cost_analysis()) vs measured wall time with honest
device→host readback, giving achieved TFLOP/s, % of bf16 peak, and
achieved HBM GB/s — the table that shows whether ~33 % MFU is compute- or
bandwidth-bound at this shape.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/roofline_d256.py
       [--batch 128] [--frames 512] [--n 10]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_FLOPS = 197e12   # bf16, v5e-class chip (bench.py convention)
PEAK_HBM = 819e9      # bytes/s, v5e-class


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
    from espnet_tpu.utils.timing import force

    enable_fast_tpu_rng()
    vocab = 500
    b, t, l = args.batch, args.frames, args.labels
    model = g._flagship(vocab, dtype=jnp.bfloat16)
    feats, ilens, ys, ylens = g._example_batch(b=b, t=t, d=80, l=l, vocab=vocab)
    feats, ilens, ys, ylens = map(jnp.asarray, (feats, ilens, ys, ylens))
    variables = model.init(
        jax.random.PRNGKey(0), feats[:1], ilens[:1], ys[:1], ylens[:1]
    )
    params = variables["params"]
    rngs = {"dropout": jax.random.PRNGKey(1), "specaug": jax.random.PRNGKey(2)}

    def measure(jitted, *a):
        """(compile → warm → time n) with readback; also pull XLA cost."""
        lowered = jitted.lower(*a)
        compiled = lowered.compile()
        try:
            ca = compiled.cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            flops = float(ca.get("flops", float("nan")))
            byts = float(ca.get("bytes accessed", float("nan")))
        except Exception:
            flops = byts = float("nan")
        out = jitted(*a)
        force(out)
        t0 = time.perf_counter()
        for _ in range(args.n):
            out = jitted(*a)
        force(out)
        dt = (time.perf_counter() - t0) / args.n
        return dt, flops, byts

    rows = []

    def add(name, jitted, *a):
        dt, fl, by = measure(jitted, *a)
        rows.append(
            {
                "region": name,
                "ms": round(dt * 1e3, 2),
                "xla_gflop": round(fl / 1e9, 1),
                "xla_gb": round(by / 1e9, 3),
                "achieved_tflops": round(fl / dt / 1e12, 1),
                "pct_of_peak_flops": round(fl / dt / PEAK_FLOPS * 100, 1),
                "achieved_hbm_gbps": round(by / dt / 1e9, 0),
                "pct_of_peak_hbm": round(by / dt / PEAK_HBM * 100, 1),
            }
        )
        print(json.dumps(rows[-1]), flush=True)
        return rows[-1]

    # full train step
    tx = build_optimizer("adam", lr=1e-4)
    state = TrainState.create(
        jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), params),
        tx, jax.random.PRNGKey(0),
    )
    step = jax.jit(make_train_step(model, tx))  # no donation: re-timeable
    batch = {
        "speech": feats, "speech_lengths": ilens,
        "text": ys, "text_lengths": ylens,
    }
    add("full_train_step", step, state, batch)

    def loss_fn(p):
        loss, _ = model.apply(
            {"params": p}, feats, ilens, ys, ylens, deterministic=False, rngs=rngs
        )
        return loss

    add("value_and_grad", jax.jit(jax.value_and_grad(loss_fn)), params)

    def enc_fn(p):
        hs, _ = model.apply(
            {"params": p}, feats, ilens, deterministic=False, rngs=rngs,
            method="encode",
        )
        return hs

    add("encoder_fwd", jax.jit(enc_fn), params)
    add(
        "encoder_fwd_bwd",
        jax.jit(jax.grad(lambda p: enc_fn(p).astype(jnp.float32).sum())),
        params,
    )

    hs = jax.jit(enc_fn)(params)
    hs = jax.block_until_ready(hs)
    hlens = jnp.minimum(ilens // 4, hs.shape[1])

    def ctc_fn(p, h):
        ys_ctc = jnp.where(ys == -1, 0, ys)
        return model.apply(
            {"params": p}, h, hlens, ys_ctc, ylens,
            method=lambda m, *a: m.ctc(*a, deterministic=False), rngs=rngs,
        )

    add("ctc_fwd_bwd", jax.jit(jax.grad(ctc_fn, argnums=(0, 1))), params, hs)

    sos = eos = vocab - 1

    def dec_fn(p, h):
        ys_in, ys_out = add_sos_eos(ys, ylens, sos, eos)
        logits = model.apply(
            {"params": p}, h, hlens, ys_in, ylens + 1,
            method=lambda m, *a: m.decoder(*a, deterministic=False), rngs=rngs,
        )
        return label_smoothing_loss(logits, ys_out, smoothing=0.1)

    add("decoder_fwd_bwd", jax.jit(jax.grad(dec_fn, argnums=(0, 1))), params, hs)

    _, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
    grads = jax.block_until_ready(grads)
    opt_state = tx.init(params)

    def opt_fn(gr, os_, p):
        import optax

        updates, os2 = tx.update(gr, os_, p)
        return optax.apply_updates(p, updates)

    add("optimizer_update", jax.jit(opt_fn), grads, opt_state, params)

    print("\nROOFLINE TABLE (d=256 flagship, b=%d t=%d)" % (b, t))
    hdr = (
        f"{'region':20s} {'ms':>8s} {'GFLOP':>9s} {'GB':>8s} "
        f"{'TFLOP/s':>8s} {'%peak':>6s} {'GB/s':>7s} {'%HBM':>6s}"
    )
    print(hdr)
    for r in rows:
        print(
            f"{r['region']:20s} {r['ms']:8.2f} {r['xla_gflop']:9.1f} "
            f"{r['xla_gb']:8.3f} {r['achieved_tflops']:8.1f} "
            f"{r['pct_of_peak_flops']:6.1f} {r['achieved_hbm_gbps']:7.0f} "
            f"{r['pct_of_peak_hbm']:6.1f}"
        )
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "roofline_d256.json")
    with open(out_path, "w") as f:
        json.dump({"batch": b, "frames": t, "rows": rows}, f, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
