"""Measure batched joint CTC/attention beam-search RTF on the flagship
Conformer (single chip). RTF = wall-time / audio-seconds decoded; also
reports utterances/s. Run on the TPU (default env) or CPU.
"""
from __future__ import annotations

import json
import time

import numpy as np

from espnet_tpu.utils.timing import force


def main(beam_size=10, batch=8, t_frames=512, maxlen=48):
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as g
    from espnet_tpu.search.beam_search import BeamSearch
    from espnet_tpu.search.scorers import transformer_decoder_cached_scorer

    vocab = 500
    model = g._flagship(vocab)
    feats, ilens, ys, ylens = g._example_batch(
        b=batch, t=t_frames, d=80, l=8, vocab=vocab
    )
    variables = model.init(
        jax.random.PRNGKey(0), feats[:1], ilens[:1], ys[:1], ylens[:1]
    )
    encode = jax.jit(
        lambda s, l: model.apply(variables, s, l, method="encode")
    )
    ctc_fn = jax.jit(lambda h: model.apply(variables, h, method="ctc_log_softmax"))
    hs, hlens = encode(jnp.asarray(feats), jnp.asarray(ilens))
    ctc_logp = ctc_fn(hs)

    dec_vars = {"params": variables["params"]["decoder"]}
    bs = BeamSearch(
        {"decoder": transformer_decoder_cached_scorer(model.decoder, dec_vars, 0.7)},
        vocab_size=vocab, sos=vocab - 1, eos=vocab - 1,
        beam_size=beam_size, ctc_weight=0.3,
    )
    run = jax.jit(lambda h, hl, c: bs(h, hl, ctc_logp=c, maxlen=maxlen))
    out = run(hs, hlens, ctc_logp)
    force(out)  # host readback: block_until_ready lies under the tunnel
    n_iter = 5
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = run(hs, hlens, ctc_logp)
    force(out)  # host readback: block_until_ready lies under the tunnel
    dt = (time.perf_counter() - t0) / n_iter
    audio_s = batch * t_frames / 100.0
    print(
        json.dumps(
            {
                "metric": "beam_search_rtf",
                "rtf": round(dt / audio_s, 5),
                "utt_per_s": round(batch / dt, 2),
                "beam": beam_size,
                "batch": batch,
                "audio_s_per_batch": audio_s,
                "decode_wall_s": round(dt, 4),
            }
        )
    )


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--beam_size", type=int, default=10)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--t_frames", type=int, default=512)
    ap.add_argument("--maxlen", type=int, default=48)
    ap.add_argument(
        "--sweep", action="store_true",
        help="sweep (batch, beam) grid instead of a single point",
    )
    args = ap.parse_args()
    if args.sweep:
        for batch, beam in [(8, 10), (32, 10), (32, 20), (64, 10)]:
            main(beam_size=beam, batch=batch, t_frames=args.t_frames,
                 maxlen=args.maxlen)
    else:
        main(beam_size=args.beam_size, batch=args.batch,
             t_frames=args.t_frames, maxlen=args.maxlen)
