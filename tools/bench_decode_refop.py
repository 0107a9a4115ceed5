"""Reference decode operating point RTF — joint CTC/attention beam 60,
ctc-weight 0.4, transformer-LM weight 0.6, on the conformer-large
(d=512) flagship. This is the reference's Librispeech production decode
config (/root/reference/egs/librispeech/asr1/conf/tuning/
decode_pytorch_transformer_large.yaml; SURVEY A.4) run through the
batched jittable beam with the KV-cached decoder AND KV-cached
transformer-LM scorers.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_decode_refop.py
       [--beam_size 60] [--batch 8] [--t_frames 512] [--maxlen 48]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from espnet_tpu.utils.timing import force


def main(beam_size=60, batch=8, t_frames=512, maxlen=48, lm_blocks=16):
    import jax
    import jax.numpy as jnp

    from espnet_tpu.models.asr import ASRModel, ConformerEncoder, TransformerDecoder
    from espnet_tpu.models.lm.models import TransformerLM
    from espnet_tpu.search.beam_search import BeamSearch
    from espnet_tpu.search.scorers import (
        transformer_decoder_cached_scorer,
        transformer_lm_cached_scorer,
    )
    from espnet_tpu.utils.env import apply_jax_platform_env, enable_fast_tpu_rng

    apply_jax_platform_env()  # honor JAX_PLATFORMS=cpu over sitecustomize
    enable_fast_tpu_rng()
    vocab = 5000  # reference BPE-5000 word pieces
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
    # reference LM: transformer, 16 blocks d=512 (lm_transformer.yaml scale)
    lm = TransformerLM(
        vocab_size=vocab, attention_dim=512, attention_heads=8,
        linear_units=2048, num_blocks=lm_blocks, dtype=jnp.bfloat16,
    )

    rng = np.random.RandomState(0)
    feats = rng.randn(batch, t_frames, 80).astype(np.float32)
    ilens = np.full(batch, t_frames, np.int32)
    ys = rng.randint(1, vocab - 1, size=(batch, 8)).astype(np.int32)
    ylens = np.full(batch, 8, np.int32)
    variables = model.init(
        jax.random.PRNGKey(0), feats[:1], ilens[:1], ys[:1], ylens[:1]
    )
    lm_vars = lm.init(jax.random.PRNGKey(1), np.zeros((1, 4), np.int32))

    encode = jax.jit(lambda s, l: model.apply(variables, s, l, method="encode"))
    ctc_fn = jax.jit(lambda h: model.apply(variables, h, method="ctc_log_softmax"))
    hs, hlens = encode(jnp.asarray(feats), jnp.asarray(ilens))
    ctc_logp = ctc_fn(hs)
    force((hs, ctc_logp))

    dec_vars = {"params": variables["params"]["decoder"]}
    bs = BeamSearch(
        {
            # att weight = 1 - ctc_weight (reference recog_v2 convention)
            "decoder": transformer_decoder_cached_scorer(model.decoder, dec_vars, 0.6),
            "lm": transformer_lm_cached_scorer(lm, lm_vars, 0.6),
        },
        vocab_size=vocab, sos=vocab - 1, eos=vocab - 1,
        beam_size=beam_size, ctc_weight=0.4,
    )
    run = jax.jit(lambda h, hl, c: bs(h, hl, ctc_logp=c, maxlen=maxlen))
    t_c0 = time.perf_counter()
    out = run(hs, hlens, ctc_logp)
    force(out)
    compile_s = time.perf_counter() - t_c0

    n_iter = 3
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = run(hs, hlens, ctc_logp)
    force(out)
    dt = (time.perf_counter() - t0) / n_iter

    # end-to-end: encode + ctc + beam
    t0 = time.perf_counter()
    hs2, hl2 = encode(jnp.asarray(feats), jnp.asarray(ilens))
    out = run(hs2, hl2, ctc_fn(hs2))
    force(out)
    dt_e2e = time.perf_counter() - t0

    audio_s = batch * t_frames / 100.0
    print(
        json.dumps(
            {
                "metric": "reference_operating_point_decode",
                "config": {
                    "beam": beam_size, "ctc_weight": 0.4, "lm_weight": 0.6,
                    "d_model": 512, "lm_blocks": lm_blocks, "vocab": vocab,
                    "batch": batch, "frames": t_frames, "maxlen": maxlen,
                },
                "beam_rtf": round(dt / audio_s, 5),
                "e2e_rtf": round(dt_e2e / audio_s, 5),
                "utt_per_s": round(batch / dt_e2e, 2),
                "beam_wall_s": round(dt, 3),
                "compile_s": round(compile_s, 1),
                "audio_s_per_batch": audio_s,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--beam_size", type=int, default=60)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--t_frames", type=int, default=512)
    ap.add_argument("--maxlen", type=int, default=48)
    ap.add_argument("--lm_blocks", type=int, default=16)
    args = ap.parse_args()
    main(args.beam_size, args.batch, args.t_frames, args.maxlen, args.lm_blocks)
