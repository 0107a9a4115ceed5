"""PRODUCT-path reference operating point: the d=512 conformer-large
flagship decoded through Speech2Text itself (not a bespoke harness) at
the reference's production decode config — beam 60, ctc 0.4,
transformer-LM 0.6 (/root/reference/egs/librispeech/asr1/conf/tuning/
decode_pytorch_transformer_large.yaml; SURVEY A.4).

Round-5 rationale: Speech2Text now threads model + scorer weights as
jit ARGUMENTS (see espnet_tpu/bin/asr_inference.py). Before that, the
closure-captured d=512 encoder weights serialized into the remote
compile payload and killed the tunnel twice (~30 min broken pipe,
journaled). This probe certifies the PRODUCT path compiles and runs at
the operating point on the real chip.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_product_refop.py
       [--beam_size 60] [--batch 8] [--t_frames 512]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(beam_size=60, batch=8, t_frames=512, lm_blocks=16):
    import jax
    import jax.numpy as jnp

    from espnet_tpu.bin.asr_inference import Speech2Text
    from espnet_tpu.models.asr import ASRModel, ConformerEncoder, TransformerDecoder
    from espnet_tpu.models.lm.models import ScannedTransformerLM
    from espnet_tpu.utils.device_journal import journal_device_use
    from espnet_tpu.utils.env import apply_jax_platform_env, enable_fast_tpu_rng
    from espnet_tpu.utils.timing import force

    apply_jax_platform_env()
    enable_fast_tpu_rng()
    journal_device_use("bench_product_refop")

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
    lm = ScannedTransformerLM(
        vocab_size=vocab, attention_dim=512, attention_heads=8,
        linear_units=2048, num_blocks=lm_blocks, dtype=jnp.bfloat16,
    )

    rng = np.random.RandomState(0)
    feats = rng.randn(batch, t_frames, 80).astype(np.float32)
    ilens = np.full(batch, t_frames, np.int32)
    ys = rng.randint(1, vocab - 1, size=(batch, 8)).astype(np.int32)
    variables = model.init(
        jax.random.PRNGKey(0), feats[:1], ilens[:1], ys[:1],
        np.full(1, 8, np.int32),
    )
    lm_vars = lm.init(jax.random.PRNGKey(1), np.zeros((1, 4), np.int32))
    token_list = [f"tok{i}" for i in range(vocab)]

    s2t = Speech2Text(
        model, variables, token_list,
        beam_size=beam_size, ctc_weight=0.4,
        lm=lm, lm_variables=lm_vars, lm_weight=0.6,
        maxlenratio=0.375,  # -> maxlen 48 at t_enc 128, matching the
        # bespoke harness (tools/bench_decode_refop.py)
    )

    t0 = time.perf_counter()
    out = s2t(feats, ilens)
    compile_s = time.perf_counter() - t0
    assert len(out) == batch and isinstance(out[0][0][0], str)

    n_iter = 3
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = s2t(feats, ilens)
    dt = (time.perf_counter() - t0) / n_iter  # Speech2Text returns host
    # data (np conversion) — the readback is the timing barrier

    audio_s = batch * t_frames / 100.0
    print(
        json.dumps(
            {
                "metric": "product_refop_decode",
                "config": {
                    "beam": beam_size, "ctc_weight": 0.4, "lm_weight": 0.6,
                    "d_model": 512, "lm_blocks": lm_blocks, "vocab": vocab,
                    "batch": batch, "frames": t_frames,
                    "path": "Speech2Text (params-as-args)",
                },
                "e2e_rtf": round(dt / audio_s, 5),
                "utt_per_s": round(batch / dt, 2),
                "compile_s": round(compile_s, 1),
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
    ap.add_argument("--lm_blocks", type=int, default=16)
    args = ap.parse_args()
    main(args.beam_size, args.batch, args.t_frames, args.lm_blocks)
