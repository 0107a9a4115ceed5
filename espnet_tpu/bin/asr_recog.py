"""CLI: ASR decoding + scoring (reference: espnet2/bin/asr_inference.py
main + utils/score_sclite.sh).

Decodes a dataset with beam search (or greedy CTC), writes hypotheses and
an sclite-style result report with corpus WER/CER.
"""
from __future__ import annotations

import argparse
import json
import logging
import sys
from pathlib import Path

import numpy as np


def main(argv=None):
    from espnet_tpu.utils.env import apply_jax_platform_env

    apply_jax_platform_env()
    argv = list(sys.argv[1:] if argv is None else argv)
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--data", action="append", default=[],
                        help="path,name,type triplet (speech source)")
    parser.add_argument("--text", default=None, help="reference text scp")
    parser.add_argument("--config", default=None, help="train config.yaml")
    parser.add_argument("--ckpt", default=None)
    parser.add_argument("--packed", default=None,
                        help="packed model zip (bin/pack.py output) — "
                        "unpacks and decodes from it; replaces "
                        "--config/--ckpt")
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--beam_size", type=int, default=10)
    parser.add_argument("--ctc_weight", type=float, default=0.3)
    parser.add_argument("--penalty", type=float, default=0.0)
    parser.add_argument("--maxlenratio", type=float, default=0.0)
    parser.add_argument("--minlenratio", type=float, default=0.0)
    parser.add_argument("--stop_criterion", default="dominance",
                        choices=["dominance", "end_detect"],
                        help="beam stopping rule: dominance bound or the "
                        "reference's end_detect (e2e_asr_common.py:21)")
    parser.add_argument("--nbest", type=int, default=1)
    parser.add_argument("--batch_size", type=int, default=1)
    parser.add_argument("--lm_config", default=None)
    parser.add_argument("--lm_ckpt", default=None)
    parser.add_argument("--lm_weight", type=float, default=0.0)
    parser.add_argument("--ngram_arpa", default=None,
                        help="ARPA LM for exact any-order jitted fusion")
    parser.add_argument("--ngram_weight", type=float, default=0.0)
    parser.add_argument("--streaming_mode", default="none",
                        choices=["none", "window", "segment"],
                        help="online decode (reference --streaming-mode: "
                        "window = growing-window greedy CTC, segment = "
                        "CTC-blank-triggered segmentation)")
    parser.add_argument("--streaming_chunk", type=int, default=2048,
                        help="input samples (or frames) fed per streaming step")
    parser.add_argument("--maskctc_threshold", type=float, default=0.99,
                        help="Mask-CTC confidence threshold for masking")
    parser.add_argument("--maskctc_iterations", type=int, default=3,
                        help="Mask-CTC refill iterations")
    parser.add_argument("--transducer_max_symbols", type=int, default=3,
                        help="greedy: max emissions per frame (1 = "
                        "time-sync one-emission greedy, curbs repeat "
                        "loops on over-confident models)")
    parser.add_argument("--transducer_search", default="greedy",
                        choices=["greedy", "default", "tsd", "alsd",
                                 "alsd_batch", "nsc"])
    parser.add_argument("--transducer_score_norm", default="true",
                        help="length-normalize final hypothesis scores "
                        "(reference BeamSearchTransducer score_norm, "
                        "beam_search_transducer.py:115-128)")
    parser.add_argument("--transducer_blank_penalty", type=float, default=0.0,
                        help="subtract this from every blank log-prob "
                        "(default/alsd/alsd_batch ablation knob)")
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    if args.packed:
        import atexit
        import shutil
        import tempfile

        from espnet_tpu.bin.pack import unpack

        d = Path(tempfile.mkdtemp(prefix="espnet_tpu_model_"))
        atexit.register(shutil.rmtree, d, ignore_errors=True)
        unpack(args.packed, d)

        def _pick(pats, what):
            # prefer the canonical name; error on ambiguity (a packed LM
            # config must not silently win over the ASR one)
            for pat in pats:
                hits = sorted(d.glob(pat))
                if len(hits) == 1:
                    return str(hits[0])
                if len(hits) > 1:
                    raise SystemExit(
                        f"--packed archive has multiple {what} candidates "
                        f"({[h.name for h in hits]}); repack with one "
                        f"canonical {what} or pass --config/--ckpt directly"
                    )
            raise SystemExit(f"--packed archive lacks a {what}: {d}")

        args.config = _pick(["config.yaml", "*.yaml"], "config")
        args.ckpt = _pick(["model.ckpt", "*.ckpt"], "checkpoint")
    elif not (args.config and args.ckpt):
        parser.error("--config/--ckpt (or --packed) required")
    from espnet_tpu.bin.asr_inference import Speech2Text
    from espnet_tpu.data.dataset import ESPnetDataset, common_collate
    from espnet_tpu.data.kaldi_io import read_scp
    from espnet_tpu.tasks.asr import build_model_from_file
    from espnet_tpu.utils.metrics import ErrorCalculator, sclite_report

    model, variables, token_list = build_model_from_file(args.config, args.ckpt)

    from espnet_tpu.models.transducer import TransducerModel

    if isinstance(model, TransducerModel):
        return _transducer_recog(args, model, variables, token_list)

    from espnet_tpu.models.asr.multispeaker import PITCTCASRModel

    if isinstance(model, PITCTCASRModel):
        return _pit_recog(args, model, variables, token_list)

    from espnet_tpu.models.asr.maskctc import MaskCTCModel

    if isinstance(model, MaskCTCModel):
        return _maskctc_recog(args, model, variables, token_list)

    if args.streaming_mode != "none":
        return _streaming_recog(args, model, variables, token_list)

    lm = lm_vars = None
    if args.lm_config and args.lm_ckpt:
        from espnet_tpu.tasks.lm import build_model_from_file as lm_bmff

        lm, lm_vars, _ = lm_bmff(args.lm_config, args.lm_ckpt)

    s2t = Speech2Text(
        model,
        variables,
        token_list,
        beam_size=args.beam_size,
        ctc_weight=args.ctc_weight,
        penalty=args.penalty,
        maxlenratio=args.maxlenratio,
        minlenratio=args.minlenratio,
        stop_criterion=args.stop_criterion,
        nbest=args.nbest,
        lm=lm,
        lm_variables=lm_vars,
        lm_weight=args.lm_weight,
        ngram_arpa=args.ngram_arpa,
        ngram_weight=args.ngram_weight,
    )

    data = [tuple(s.split(",")) for s in args.data]
    ds = ESPnetDataset(data)
    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    hyps = {}
    nbest = {}
    keys = ds.keys
    for i in range(0, len(keys), args.batch_size):
        kb = keys[i: i + args.batch_size]
        samples = [ds[k] for k in kb]
        batch = common_collate(samples)
        results = s2t(batch["speech"], batch["speech_lengths"])
        for k, nb in zip(kb, results):
            hyps[k] = nb[0][0]
            # reference result-json convention (asr_utils.parse_hypothesis):
            # rec_token / rec_tokenid are space-joined strings
            nbest[k] = [
                {"rec_text": txt, "rec_token": " ".join(toks),
                 "rec_tokenid": " ".join(str(i) for i in ids),
                 "score": float(sc)}
                for txt, toks, ids, sc in nb
            ]
            logging.info("%s: %s", k, nb[0][0])

    with open(out / "text", "w") as f:
        for k, v in hyps.items():
            f.write(f"{k} {v}\n")
    if args.nbest > 1:
        # n-best hypotheses in the reference's result-json convention
        # (asr_utils.add_results_to_json:808)
        (out / "nbest.json").write_text(
            json.dumps({"utts": nbest}, indent=1)
        )

    if args.text:
        refs = read_scp(args.text)
        word_pairs = {
            k: (refs[k].split(), hyps[k].split()) for k in hyps if k in refs
        }
        char_pairs = {
            k: (list(refs[k].replace(" ", "")), list(hyps[k].replace(" ", "")))
            for k in hyps
            if k in refs
        }
        (out / "result.wrd.txt").write_text(sclite_report(word_pairs))
        (out / "result.txt").write_text(sclite_report(char_pairs))
        n_w = sum(len(r) for r, _ in word_pairs.values())
        n_c = sum(len(r) for r, _ in char_pairs.values())
        from espnet_tpu.utils.metrics import edit_distance

        wer = sum(edit_distance(r, h) for r, h in word_pairs.values()) / max(n_w, 1)
        cer = sum(edit_distance(r, h) for r, h in char_pairs.values()) / max(n_c, 1)
        summary = {"wer": wer, "cer": cer, "num_utts": len(word_pairs)}
        (out / "summary.json").write_text(json.dumps(summary))
        logging.info("WER=%.2f%% CER=%.2f%%", wer * 100, cer * 100)
        return summary




def _transducer_recog(args, model, variables, token_list):
    """Transducer decode path (greedy jittable or host beam variants).

    LM shallow fusion (--lm_config/--lm_ckpt/--lm_weight) matches the
    reference BeamSearchTransducer (beam_search_transducer.py:34,
    204-224): available in every beam algorithm incl. the batched
    device ALSD (RNN LM rides the lax.scan)."""
    import jax.numpy as jnp

    from espnet_tpu.data.dataset import ESPnetDataset, common_collate
    from espnet_tpu.data.kaldi_io import read_scp
    from espnet_tpu.search.transducer import (
        rnnlm_fusion,
        transducer_alsd_decode,
        transducer_alsd_decode_batch,
        transducer_beam_decode,
        transducer_greedy_decode,
        transducer_nsc_decode,
        transducer_tsd_decode,
        transformerlm_fusion,
    )
    from espnet_tpu.utils.metrics import edit_distance, sclite_report

    lmf = None
    if args.lm_config and args.lm_ckpt and args.lm_weight != 0.0:
        from espnet_tpu.models.lm.models import SequentialRNNLM
        from espnet_tpu.tasks.lm import build_model_from_file as lm_bmff

        lm, lm_vars, _ = lm_bmff(args.lm_config, args.lm_ckpt)
        if isinstance(lm, SequentialRNNLM):
            lmf = rnnlm_fusion(lm, lm_vars, args.lm_weight)
        else:
            lmf = transformerlm_fusion(lm, lm_vars, args.lm_weight)

    score_norm = str(args.transducer_score_norm).lower() != "false"
    data = [tuple(s.split(",")) for s in args.data]
    ds = ESPnetDataset(data)
    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    space = "<space>"
    hyps = {}
    beam_fns = {
        "default": transducer_beam_decode,
        "tsd": transducer_tsd_decode,
        "alsd": transducer_alsd_decode,
        "nsc": transducer_nsc_decode,
    }
    beam_kwargs = {"score_norm": score_norm, "lm": lmf}
    if args.transducer_blank_penalty:
        # only the algorithms with the ablation knob accept it
        beam_kwargs["blank_penalty"] = args.transducer_blank_penalty
    for i in range(0, len(ds.keys), args.batch_size):
        kb = ds.keys[i: i + args.batch_size]
        batch = common_collate([ds[k] for k in kb])
        hs, hlens = model.apply(
            variables, jnp.asarray(batch["speech"]),
            jnp.asarray(batch["speech_lengths"]), method="encode",
        )
        if args.transducer_search == "greedy":
            ids, lens = transducer_greedy_decode(
                model, variables, hs, hlens,
                max_symbols=args.transducer_max_symbols,
            )
            ids, lens = np.asarray(ids), np.asarray(lens)
            results = [
                [int(x) for x in ids[b][: lens[b]]] for b in range(len(kb))
            ]
        elif args.transducer_search == "alsd_batch":
            # jittable whole-batch device beam search (no host loop)
            yseq, ylens, _ = transducer_alsd_decode_batch(
                model, variables, hs, hlens, beam_size=args.beam_size,
                score_norm=score_norm, lm=lmf,
                blank_penalty=args.transducer_blank_penalty,
            )
            yseq, ylens = np.asarray(yseq), np.asarray(ylens)
            results = [
                [int(x) for x in yseq[b, 0, : ylens[b, 0]]]
                for b in range(len(kb))
            ]
        else:
            fn = beam_fns[args.transducer_search]
            kw = dict(beam_kwargs)
            if args.transducer_search in ("tsd", "nsc"):
                kw.pop("blank_penalty", None)
            results = [
                fn(model, variables, hs[b: b + 1], int(hlens[b]),
                   beam_size=args.beam_size, **kw)[0][0]
                for b in range(len(kb))
            ]
        for k, seq in zip(kb, results):
            toks = [token_list[t] for t in seq if 0 <= t < len(token_list)]
            hyps[k] = "".join(" " if t == space else t for t in toks)
            logging.info("%s: %s", k, hyps[k])
    with open(out / "text", "w") as f:
        for k, v in hyps.items():
            f.write(f"{k} {v}\n")
    if args.text:
        refs = read_scp(args.text)
        word_pairs = {k: (refs[k].split(), hyps[k].split()) for k in hyps if k in refs}
        (out / "result.wrd.txt").write_text(sclite_report(word_pairs))
        n_w = sum(len(r) for r, _ in word_pairs.values())
        wer = sum(edit_distance(r, h) for r, h in word_pairs.values()) / max(n_w, 1)
        summary = {"wer": wer, "num_utts": len(word_pairs)}
        (out / "summary.json").write_text(json.dumps(summary))
        logging.info("WER=%.2f%%", wer * 100)
        return summary


def _streaming_recog(args, model, variables, token_list):
    """Online decode (reference streaming/window.py:6, segment.py:5):
    feed each utterance in --streaming_chunk pieces; window mode keeps
    the last incremental hypothesis, segment mode concatenates finalized
    segments (+ an end-of-stream flush)."""
    from espnet_tpu.data.dataset import ESPnetDataset
    from espnet_tpu.data.kaldi_io import read_scp
    from espnet_tpu.search.streaming import SegmentStreamingASR, WindowStreamingASR
    from espnet_tpu.utils.metrics import edit_distance, sclite_report

    data = [tuple(spec.split(",")) for spec in args.data]
    ds = ESPnetDataset(data)
    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    space = "<space>"
    hyps = {}
    # ONE decoder reused across utterances (its jitted encoder/CTC
    # closures cache by bucketed shape); a fresh instance per utterance
    # would recompile the encoder every time
    if args.streaming_mode == "window":
        # max_frames is a runaway-stream guard; raw-sample input (in-
        # model frontend) counts SAMPLES, so size it for minutes of
        # audio — the device buffer only grows by doubling as needed
        dec = WindowStreamingASR(model, variables, max_frames=2**20)
    else:
        dec = SegmentStreamingASR(model, variables)
    for key in ds.keys:
        wav = ds[key]["speech"]  # raw samples (t,) or features (t, D)
        dec.buf = None  # reset stream state between utterances
        if args.streaming_mode == "window":
            ids = []
            for i in range(0, len(wav), args.streaming_chunk):
                ids = dec.accept_input(wav[i : i + args.streaming_chunk])
        else:
            ids = []
            for i in range(0, len(wav), args.streaming_chunk):
                seg = dec.accept_input(wav[i : i + args.streaming_chunk])
                if seg:
                    ids.extend(seg)
            tail = dec.flush()
            if tail:
                ids.extend(tail)
        toks = [token_list[t] for t in ids if 0 <= t < len(token_list)]
        hyps[key] = "".join(" " if t == space else t for t in toks)
        logging.info("%s: %s", key, hyps[key])
    with open(out / "text", "w") as f:
        for k, v in hyps.items():
            f.write(f"{k} {v}\n")
    if args.text:
        refs = read_scp(args.text)
        word_pairs = {
            k: (refs[k].split(), hyps[k].split()) for k in hyps if k in refs
        }
        (out / "result.wrd.txt").write_text(sclite_report(word_pairs))
        n_w = sum(len(r) for r, _ in word_pairs.values())
        wer = sum(
            edit_distance(r, h) for r, h in word_pairs.values()
        ) / max(n_w, 1)
        summary = {"wer": wer, "num_utts": len(word_pairs)}
        (out / "summary.json").write_text(json.dumps(summary))
        logging.info("WER=%.2f%%", wer * 100)
        return summary


def _maskctc_recog(args, model, variables, token_list):
    """Mask-CTC non-autoregressive decode (e2e_asr_maskctc.py:174):
    greedy CTC init, iterative refill of low-confidence <mask> tokens."""
    from espnet_tpu.data.dataset import ESPnetDataset, common_collate
    from espnet_tpu.data.kaldi_io import read_scp
    from espnet_tpu.models.asr.maskctc import maskctc_recognize
    from espnet_tpu.utils.metrics import edit_distance, sclite_report

    data = [tuple(s.split(",")) for s in args.data]
    ds = ESPnetDataset(data)
    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    space = "<space>"
    hyps = {}
    for i in range(0, len(ds.keys), args.batch_size):
        kb = ds.keys[i : i + args.batch_size]
        batch = common_collate([ds[k] for k in kb])
        results = maskctc_recognize(
            model,
            variables,
            batch["speech"],
            batch["speech_lengths"],
            threshold=args.maskctc_threshold,
            n_iterations=args.maskctc_iterations,
        )
        for k, seq in zip(kb, results):
            toks = [token_list[t] for t in seq if 0 <= t < len(token_list)]
            hyps[k] = "".join(" " if t == space else t for t in toks)
            logging.info("%s: %s", k, hyps[k])
    with open(out / "text", "w") as f:
        for k, v in hyps.items():
            f.write(f"{k} {v}\n")
    if args.text:
        refs = read_scp(args.text)
        word_pairs = {
            k: (refs[k].split(), hyps[k].split()) for k in hyps if k in refs
        }
        (out / "result.wrd.txt").write_text(sclite_report(word_pairs))
        n_w = sum(len(r) for r, _ in word_pairs.values())
        wer = sum(
            edit_distance(r, h) for r, h in word_pairs.values()
        ) / max(n_w, 1)
        summary = {"wer": wer, "num_utts": len(word_pairs)}
        (out / "summary.json").write_text(json.dumps(summary))
        logging.info("WER=%.2f%%", wer * 100)
        return summary


def _pit_recog(args, model, variables, token_list):
    """Multi-speaker PIT decode: greedy CTC per branch; scoring uses the
    best speaker permutation (reference utils/eval_perm_free_error.py)."""
    import itertools

    import jax
    import jax.numpy as jnp

    from espnet_tpu.bin.asr_inference import ctc_greedy_decode_host
    from espnet_tpu.data.dataset import ESPnetDataset, common_collate
    from espnet_tpu.data.kaldi_io import read_scp
    from espnet_tpu.utils.metrics import edit_distance

    branches = jax.jit(
        lambda s, l: model.apply(
            variables, s, l, method="encode_branches"
        )
    )
    data = [tuple(s.split(",")) for s in args.data]
    ds = ESPnetDataset(data)
    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    space = "<space>"
    hyps = {}  # uid -> [spk1_text, spk2_text, ...]
    for i in range(0, len(ds.keys), args.batch_size):
        kb = ds.keys[i: i + args.batch_size]
        batch = common_collate([ds[k] for k in kb])
        logps, blens = branches(
            jnp.asarray(batch["speech"]), jnp.asarray(batch["speech_lengths"])
        )
        per_spk = []
        for lp in logps:
            ids = ctc_greedy_decode_host(np.asarray(lp), np.asarray(blens))
            per_spk.append(ids)
        for b, k in enumerate(kb):
            texts = []
            for ids in (spk[b] for spk in per_spk):
                toks = [token_list[t] for t in ids if 0 <= t < len(token_list)]
                texts.append("".join(" " if t == space else t for t in toks))
            hyps[k] = texts
            logging.info("%s: %s", k, " | ".join(texts))
    with open(out / "text", "w") as f:
        for k, v in hyps.items():
            for n, t in enumerate(v):
                f.write(f"{k}_spk{n + 1} {t}\n")
    if args.text:
        # refs: <uid>_spk<N> convention
        refs = read_scp(args.text)
        tot_err = tot_words = 0
        for k, v in hyps.items():
            ref_texts = [
                refs.get(f"{k}_spk{n + 1}", "") for n in range(len(v))
            ]
            best = None
            for perm in itertools.permutations(range(len(v))):
                err = sum(
                    edit_distance(ref_texts[j].split(), v[p].split())
                    for j, p in enumerate(perm)
                )
                best = err if best is None else min(best, err)
            tot_err += best
            tot_words += sum(len(r.split()) for r in ref_texts)
        wer = tot_err / max(tot_words, 1)
        summary = {"wer": wer, "num_utts": len(hyps), "perm_free": True}
        (out / "summary.json").write_text(json.dumps(summary))
        logging.info("perm-free WER=%.2f%%", wer * 100)
        return summary


if __name__ == "__main__":
    main()
