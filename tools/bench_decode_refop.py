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


def main(beam_size=60, batch=8, t_frames=512, maxlen=48, lm_blocks=16,
         cpu_encode=False, scan_lm=False):
    """cpu_encode: run encoder+CTC on the host CPU backend and ship hs
    to the device — the d=512 INFERENCE-mode encoder remote compile has
    twice killed the tunnel after ~30 min (broken pipe, journaled); the
    beam program is the operating-point measurement, so isolate it."""
    import jax
    import jax.numpy as jnp

    from espnet_tpu.models.asr import ASRModel, ConformerEncoder, TransformerDecoder
    from espnet_tpu.models.lm.models import ScannedTransformerLM, TransformerLM
    from espnet_tpu.search.beam_search import BeamSearch
    from espnet_tpu.search.scorers import (
        transformer_decoder_cached_scorer,
        transformer_lm_cached_scorer,
    )
    from espnet_tpu.utils.env import apply_jax_platform_env, enable_fast_tpu_rng

    apply_jax_platform_env()  # honor JAX_PLATFORMS=cpu over sitecustomize
    if cpu_encode:
        # expose the host CPU backend alongside the device backend
        cur = jax.config.jax_platforms or ""
        if "cpu" not in cur.split(","):
            jax.config.update("jax_platforms", (cur + ",cpu").lstrip(","))
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
    # reference LM: transformer, 16 blocks d=512 (lm_transformer.yaml scale).
    # scan_lm: scan-over-layers variant — compiled program size constant
    # in depth (the unrolled 16-block beam program exceeds the tunnel's
    # compile-payload limit, HTTP 413)
    lm_cls = ScannedTransformerLM if scan_lm else TransformerLM
    lm = lm_cls(
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

    # params as jit args (not captured constants — see _run below)
    _enc_jit_kw = {}
    if cpu_encode:
        _enc_jit_kw["device"] = jax.devices("cpu")[0]
    _encode = jax.jit(
        lambda v, s, l: model.apply(v, s, l, method="encode"), **_enc_jit_kw
    )
    _ctc = jax.jit(
        lambda v, h: model.apply(v, h, method="ctc_log_softmax"), **_enc_jit_kw
    )
    encode = lambda s, l: _encode(variables, s, l)
    ctc_fn = lambda h: _ctc(variables, h)
    hs, hlens = encode(jnp.asarray(feats), jnp.asarray(ilens))
    ctc_logp = ctc_fn(hs)
    force((hs, ctc_logp))
    if cpu_encode:
        dev = jax.devices()[0]
        hs, hlens, ctc_logp = (
            jax.device_put(np.asarray(hs), dev),
            jax.device_put(np.asarray(hlens), dev),
            jax.device_put(np.asarray(ctc_logp), dev),
        )

    dec_vars = {"params": variables["params"]["decoder"]}

    # weights enter as jit ARGUMENTS, not closure constants: captured
    # arrays are embedded in the serialized compile payload, and the
    # d=512 decoder + 16-block LM weights alone exceed the tunnel's
    # remote-compile upload limit (HTTP 413, measured r5)
    def _run(h, hl, c, dvars, lvars):
        bs = BeamSearch(
            {
                # att weight = 1 - ctc_weight (reference recog_v2 convention)
                "decoder": transformer_decoder_cached_scorer(model.decoder, dvars, 0.6),
                "lm": transformer_lm_cached_scorer(lm, lvars, 0.6),
            },
            vocab_size=vocab, sos=vocab - 1, eos=vocab - 1,
            beam_size=beam_size, ctc_weight=0.4,
        )
        return bs(h, hl, ctc_logp=c, maxlen=maxlen)

    _jit = jax.jit(_run)
    run = lambda h, hl, c: _jit(h, hl, c, dec_vars, lm_vars)
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

    # end-to-end: encode + ctc + beam (encode on device unless cpu_encode,
    # where e2e includes the host encode + transfer — labeled in output)
    t0 = time.perf_counter()
    hs2, hl2 = encode(jnp.asarray(feats), jnp.asarray(ilens))
    c2 = ctc_fn(hs2)
    if cpu_encode:
        dev = jax.devices()[0]
        hs2, hl2, c2 = (
            jax.device_put(np.asarray(hs2), dev),
            jax.device_put(np.asarray(hl2), dev),
            jax.device_put(np.asarray(c2), dev),
        )
    out = run(hs2, hl2, c2)
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
                    "cpu_encode": cpu_encode, "scan_lm": scan_lm,
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
    ap.add_argument("--cpu_encode", action="store_true")
    ap.add_argument("--scan_lm", action="store_true")
    args = ap.parse_args()
    main(args.beam_size, args.batch, args.t_frames, args.maxlen,
         args.lm_blocks, args.cpu_encode, args.scan_lm)
