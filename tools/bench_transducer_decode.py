"""RTF of the batched jittable ALSD transducer beam search vs the
host-side per-utterance ALSD loop (VERDICT r1 item 6: batch>1 device
decode with RTF).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_transducer_decode.py
"""
from __future__ import annotations

import json
import time

import numpy as np

from espnet_tpu.utils.timing import force

FPS = 100.0


def main(batch=16, t_frames=256, beam=5, vocab=500):
    import jax
    import jax.numpy as jnp

    from espnet_tpu.models.asr import ConformerEncoder
    from espnet_tpu.models.transducer.model import TransducerModel
    from espnet_tpu.search.transducer import (
        transducer_alsd_decode,
        transducer_alsd_decode_batch,
    )

    enc = ConformerEncoder(
        attention_dim=256, attention_heads=4, linear_units=1024, num_blocks=12
    )
    model = TransducerModel(
        vocab_size=vocab, encoder=enc, dunits=256, joint_dim=256
    )
    rng = np.random.RandomState(0)
    feats = rng.randn(batch, t_frames, 80).astype(np.float32)
    flens = np.full(batch, t_frames, np.int32)
    ys = rng.randint(1, vocab - 1, size=(batch, 8)).astype(np.int32)
    ylens = np.full(batch, 8, np.int32)
    variables = model.init(
        jax.random.PRNGKey(0), feats[:1], flens[:1], ys[:1], ylens[:1]
    )
    hs, hlens = jax.jit(
        lambda s, l: model.apply(variables, s, l, method="encode")
    )(jnp.asarray(feats), jnp.asarray(flens))
    force(hs)

    # cap u_max for decode speed (labels rarely exceed ~1/4 of frames)
    run = jax.jit(
        lambda h, hl: transducer_alsd_decode_batch(
            model, variables, h, hl, beam_size=beam, u_max_ratio=0.25
        )
    )
    out = run(hs, hlens)
    force(out)  # host readback: block_until_ready lies under the tunnel
    n_iter = 3
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = run(hs, hlens)
    force(out)  # host readback: block_until_ready lies under the tunnel
    dt_batch = (time.perf_counter() - t0) / n_iter

    # host per-utterance ALSD on a subset (it is slow)
    n_host = min(2, batch)
    t0 = time.perf_counter()
    for i in range(n_host):
        transducer_alsd_decode(
            model, variables, hs[i : i + 1], int(hlens[i]),
            beam_size=beam, u_max_ratio=0.25,
        )
    dt_host_per_utt = (time.perf_counter() - t0) / n_host

    audio_s = batch * t_frames / FPS
    print(
        json.dumps(
            {
                "batch": batch,
                "beam": beam,
                "t_frames": t_frames,
                "batch_alsd_rtf": round(dt_batch / audio_s, 5),
                "batch_alsd_utts_per_s": round(batch / dt_batch, 2),
                "host_alsd_rtf": round(
                    dt_host_per_utt / (t_frames / FPS), 5
                ),
                "speedup_vs_host": round(
                    dt_host_per_utt * batch / dt_batch, 1
                ),
                "backend": jax.devices()[0].platform,
            }
        )
    )


if __name__ == "__main__":
    main()
