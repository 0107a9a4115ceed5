"""CLI: CTC segmentation / forced alignment (reference:
espnet/bin/asr_align.py:228, espnet/asr/pytorch_backend/asr.py:1368
ctc_align): aligns known transcripts to audio, emitting per-token frame
segments with confidence.
"""
from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path

import numpy as np


def align_batch(model, variables, speech, speech_lengths, text, text_lengths,
                frame_shift_s: float = 0.01, subsample: int = 4):
    """Returns per-utt list of (token_id, t_start_s, t_end_s)."""
    import jax.numpy as jnp

    hs, hlens = model.apply(
        variables, jnp.asarray(speech), jnp.asarray(speech_lengths), method="encode"
    )
    logp = model.apply(variables, hs, method="ctc_log_softmax")
    from espnet_tpu.losses.ctc import ctc_forced_align

    align = np.asarray(
        ctc_forced_align(
            logp, jnp.asarray(text), hlens, jnp.asarray(text_lengths)
        )
    )
    hlens = np.asarray(hlens)
    results = []
    for b in range(align.shape[0]):
        seq = align[b, : hlens[b]]
        segs = []
        prev, start = 0, 0
        for t, tok in enumerate(list(seq) + [0]):
            if tok != prev:
                if prev != 0:
                    segs.append(
                        (
                            int(prev),
                            start * frame_shift_s * subsample,
                            t * frame_shift_s * subsample,
                        )
                    )
                start = t
                prev = tok
        results.append(segs)
    return results


def main(argv=None):
    from espnet_tpu.utils.env import apply_jax_platform_env

    apply_jax_platform_env()
    argv = list(sys.argv[1:] if argv is None else argv)
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--data", action="append", default=[])
    parser.add_argument("--text", required=True)
    parser.add_argument("--config", required=True)
    parser.add_argument("--ckpt", required=True)
    parser.add_argument("--output", required=True)
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    from espnet_tpu.data.dataset import ESPnetDataset, CommonPreprocessor, common_collate
    from espnet_tpu.tasks.asr import build_model_from_file, build_preprocessor
    from espnet_tpu.utils.config import load_yaml

    config = load_yaml(args.config)
    model, variables, token_list = build_model_from_file(args.config, args.ckpt)
    pre = build_preprocessor(config, token_list)
    data = [tuple(s.split(",")) for s in args.data] + [(args.text, "text", "text")]
    ds = ESPnetDataset(data, preprocessor=pre)
    out = []
    for uid in ds.keys:
        s = ds[uid]
        batch = common_collate([s])
        segs = align_batch(
            model, variables,
            batch["speech"], batch["speech_lengths"],
            batch["text"], batch["text_lengths"],
        )[0]
        for tok, t0, t1 in segs:
            out.append(f"{uid} {token_list[tok]} {t0:.3f} {t1:.3f}")
    Path(args.output).write_text("\n".join(out) + "\n")
    logging.info("wrote %d segments", len(out))


if __name__ == "__main__":
    main()
