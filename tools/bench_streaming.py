"""Streaming-decode latency/RTF benchmark (roadmap: decode throughput).

Feeds hop-sized frame chunks of a simulated long utterance through
WindowStreamingASR over the flagship Conformer and reports per-hop
latency (the user-facing number for streaming) and overall RTF. The
bucketed window padding means only a handful of shapes compile; the
steady-state hop latency is what matters.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_streaming.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    import __graft_entry__ as g
    from espnet_tpu.search.streaming import WindowStreamingASR
    from espnet_tpu.utils.env import enable_fast_tpu_rng

    enable_fast_tpu_rng()
    vocab = 500
    model = g._flagship(vocab, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    feats, ilens, ys, ylens = g._example_batch(b=1, t=64, d=80, l=4, vocab=vocab)
    variables = model.init(jax.random.PRNGKey(0), feats, ilens, ys, ylens)

    hop = 32  # 320 ms of audio per chunk at 10 ms frame shift
    total_frames = 1024  # ~10.24 s utterance
    stream = WindowStreamingASR(model, variables, hop_frames=hop, pad_to=128)

    # warm the compile cache over every bucketed shape first
    for _ in range(total_frames // hop):
        stream.accept_input(rng.randn(hop, 80).astype(np.float32))
    stream.buf = None

    lat = []
    t_all0 = time.perf_counter()
    for _ in range(total_frames // hop):
        chunk = rng.randn(hop, 80).astype(np.float32)
        t0 = time.perf_counter()
        hyp = stream.accept_input(chunk)
        lat.append(time.perf_counter() - t0)
    t_all = time.perf_counter() - t_all0

    audio_s = total_frames * 0.01
    lat_ms = np.array(lat) * 1e3
    print(
        f"window streaming: hop {hop} frames ({hop * 10} ms audio), "
        f"utterance {audio_s:.1f}s"
    )
    print(
        f"per-hop latency ms: median {np.median(lat_ms):.1f}  "
        f"p90 {np.percentile(lat_ms, 90):.1f}  max {lat_ms.max():.1f}"
    )
    print(f"overall RTF {t_all / audio_s:.4f} (compile-warm)")

    # --- ceiling decomposition: is the hop latency the tunnel's
    # dispatch+readback floor, or the growing-window re-encode cost?
    # (VERDICT r4 #5 done-criterion: <20 ms/hop or a measured floor proof)
    import jax.numpy as jnp

    @jax.jit
    def _tiny(x):
        return (x * 2.0).sum()

    xs = jnp.ones((8, 8))
    float(_tiny(xs))  # compile
    t0 = time.perf_counter()
    n_d = 20
    for _ in range(n_d):
        v = float(_tiny(xs))  # scalar readback every iteration
    floor_ms = (time.perf_counter() - t0) / n_d * 1e3
    print(f"dispatch+scalar-readback floor: {floor_ms:.1f} ms")

    # per-bucket hop latency: fused update+encode+argmax on a fixed
    # device-resident window of each capacity (chunk upload included)
    for t_pad in (128, 256, 512, 1024):
        stepf = stream._step_fn(t_pad, hop)
        buf = jnp.zeros((1, t_pad, 80))
        chunk = rng.randn(1, hop, 80).astype(np.float32)
        buf, ids, hl = stepf(
            buf, jnp.asarray(chunk), jnp.int32(0), jnp.int32(t_pad)
        )
        np.asarray(ids)
        t0 = time.perf_counter()
        for _ in range(10):
            buf, ids, hl = stepf(
                buf, jnp.asarray(chunk), jnp.int32(0), jnp.int32(t_pad)
            )
            np.asarray(ids)  # same readback the hop path does
        per = (time.perf_counter() - t0) / 10 * 1e3
        print(f"window {t_pad:5d} frames: {per:7.1f} ms/hop")


if __name__ == "__main__":
    main()
