"""CLI: CTC alignment (reference: espnet/bin/asr_align.py:228,
espnet/asr/pytorch_backend/asr.py:1368 ctc_align).

Two modes:
- default: short-utterance forced alignment — aligns each utterance's
  known transcript to its own audio, emitting per-token frame segments
  WITH per-token confidence (mean aligned log-posterior).
- --utt2audio FILE: long-audio CTC segmentation — locates utterances
  WITHIN long recordings (banded Viterbi over CTC posteriors with free
  start/end, see search/ctc_segmentation.py) and writes a Kaldi-style
  `segments` file `uttid audioid t_start t_end confidence`.
"""
from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path

import numpy as np


def align_batch(model, variables, speech, speech_lengths, text, text_lengths,
                fs: int = 16000):
    """Forced alignment. Returns per-utt list of
    (token_id, t_start_s, t_end_s, confidence) — confidence is the mean
    log-posterior of the token over its aligned frames. Seconds per
    encoder frame is self-calibrated from audio duration / encoder
    length (covers any frontend hop + encoder subsampling combination)."""
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
    logp = np.asarray(logp)
    hlens = np.asarray(hlens)
    speech_lengths = np.asarray(speech_lengths)
    results = []
    for b in range(align.shape[0]):
        spf = (speech_lengths[b] / fs) / max(int(hlens[b]), 1)
        seq = align[b, : hlens[b]]
        segs = []
        prev, start = 0, 0
        for t, tok in enumerate(list(seq) + [0]):
            if tok != prev:
                if prev != 0:
                    conf = float(np.mean(logp[b, start:t, prev]))
                    segs.append(
                        (int(prev), start * spf, t * spf, conf)
                    )
                start = t
                prev = tok
        results.append(segs)
    return results


def segment_long_audio(model, variables, speech, speech_length,
                       utt_tokens, fs: int = 16000,
                       gratis_blank=True, band=0):
    """CTC segmentation of one long recording.

    utt_tokens: list of (uttid, token_id_list) in transcript order.
    Returns list of (uttid, t_start_s, t_end_s, confidence)."""
    import jax.numpy as jnp

    from espnet_tpu.search.ctc_segmentation import ctc_segmentation_align

    hs, hlens = model.apply(
        variables,
        jnp.asarray(speech)[None],
        jnp.asarray([speech_length]),
        method="encode",
    )
    t_enc = int(np.asarray(hlens)[0])
    logp = np.asarray(model.apply(variables, hs, method="ctc_log_softmax"))[0]
    logp = logp[:t_enc]
    spf = (speech_length / fs) / max(t_enc, 1)  # seconds per enc frame
    segs, _ = ctc_segmentation_align(
        logp, [toks for _, toks in utt_tokens],
        gratis_blank=gratis_blank, band=band,
    )
    return [
        (uid, s * spf, e * spf, conf)
        for (uid, _), (s, e, conf) in zip(utt_tokens, segs)
    ]


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
    parser.add_argument("--utt2audio", default=None,
                        help="uttid->audioid map: enables long-audio CTC "
                        "segmentation; --output becomes a segments file")
    parser.add_argument("--gratis_blank", type=lambda s: s == "true",
                        default=True,
                        help="zero-cost blanks (long-audio mode): gaps "
                        "between utterances don't drag scores down")
    parser.add_argument("--band", type=int, default=0,
                        help="Viterbi state band (0 = full DP)")
    parser.add_argument("--frame_shift", type=float, default=0.01)
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    from espnet_tpu.data.dataset import ESPnetDataset, CommonPreprocessor, common_collate
    from espnet_tpu.data.kaldi_io import read_scp
    from espnet_tpu.tasks.asr import build_model_from_file, build_preprocessor
    from espnet_tpu.utils.config import load_yaml

    config = load_yaml(args.config)
    model, variables, token_list = build_model_from_file(args.config, args.ckpt)
    pre = build_preprocessor(config, token_list)
    fs = int(config.get("frontend_conf", {}).get("fs", 16000))

    if args.utt2audio:
        # ---- long-audio CTC segmentation -> Kaldi segments file
        utt2audio = read_scp(args.utt2audio)
        texts = read_scp(args.text)
        wav_scp = None
        for spec in args.data:
            path, name, typ = spec.split(",")
            if name == "speech":
                wav_scp = (path, typ)
        if wav_scp is None:
            raise SystemExit("--data wav.scp,speech,sound required")
        audio_ds = ESPnetDataset([(wav_scp[0], "speech", wav_scp[1])],
                                 preprocessor=pre)
        by_audio = {}
        for uid, aid in utt2audio.items():
            toks = np.asarray(
                pre.converter.tokens2ids(pre.tokenizer.text2tokens(texts[uid])),
                dtype=np.int64,
            )
            by_audio.setdefault(aid, []).append((uid, list(toks)))
        out_lines = []
        for aid, utts in by_audio.items():
            sample = audio_ds[aid]
            speech = sample["speech"]
            segs = segment_long_audio(
                model, variables, speech, len(speech), utts, fs=fs,
                gratis_blank=args.gratis_blank, band=args.band,
            )
            for uid, t0, t1, conf in segs:
                out_lines.append(f"{uid} {aid} {t0:.3f} {t1:.3f} {conf:.4f}")
                logging.info("%s in %s: %.2fs-%.2fs conf %.3f",
                             uid, aid, t0, t1, conf)
        Path(args.output).write_text("\n".join(out_lines) + "\n")
        logging.info("wrote %d segments", len(out_lines))
        return

    # ---- short-utterance forced alignment
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
            fs=fs,
        )[0]
        for tok, t0, t1, conf in segs:
            out.append(f"{uid} {token_list[tok]} {t0:.3f} {t1:.3f} {conf:.4f}")
    Path(args.output).write_text("\n".join(out) + "\n")
    logging.info("wrote %d segments", len(out))


if __name__ == "__main__":
    main()
