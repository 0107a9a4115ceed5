"""CLI: enhancement/separation scoring (reference: espnet2/bin/
enh_scoring.py): SI-SNR, SDR and STOI between reference and estimated
wav scps, with PIT over speaker orderings (SI-SNR picks the
permutation; the other metrics follow it, as in the reference).
"""
from __future__ import annotations

import argparse
import json
import logging
import sys
from itertools import permutations
from pathlib import Path

import numpy as np


def sdr(est: np.ndarray, ref: np.ndarray, eps: float = 1e-8) -> float:
    num = float((ref**2).sum())
    den = float(((est - ref) ** 2).sum())
    return 10.0 * np.log10(num / max(den, eps) + eps)


def si_snr_np(est: np.ndarray, ref: np.ndarray, eps: float = 1e-8) -> float:
    est = est - est.mean()
    ref = ref - ref.mean()
    proj = (est @ ref) / max(float(ref @ ref), eps) * ref
    noise = est - proj
    return 10.0 * np.log10(
        max(float((proj**2).sum()), eps) / max(float((noise**2).sum()), eps)
    )


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--ref_scp", nargs="+", required=True)
    parser.add_argument("--est_scp", nargs="+", required=True)
    parser.add_argument("--output_dir", required=True)
    parser.add_argument(
        "--stoi",
        action="store_true",
        help="also compute STOI intelligibility (needs sample rate from wavs)",
    )
    parser.add_argument(
        "--pesq",
        action="store_true",
        help="also compute the P.862-style perceptual quality score "
        "(own implementation, utils/pesq.py; relative measure, not "
        "ITU-certified)",
    )
    parser.add_argument(
        "--bss_eval",
        action="store_true",
        help="also compute BSS Eval SDR/SIR/SAR (own bss_eval_sources, "
        "replacing the reference's mir_eval dependency; uses BSS Eval's "
        "own max-SIR permutation)",
    )
    parser.add_argument(
        "--bss_eval_flen",
        type=int,
        default=512,
        help="distortion-filter length for BSS Eval projections",
    )
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    from espnet_tpu.data.kaldi_io import read_scp
    from espnet_tpu.data.wav import read_wav

    refs = [read_scp(p) for p in args.ref_scp]
    ests = [read_scp(p) for p in args.est_scp]
    n_spk = len(refs)
    assert len(ests) == n_spk

    totals = {"si_snr": 0.0, "sdr": 0.0}
    if args.stoi:
        totals["stoi"] = 0.0
    if args.bss_eval:
        totals.update({"bss_sdr": 0.0, "bss_sir": 0.0, "bss_sar": 0.0})
    if args.pesq:
        totals["pesq"] = 0.0
    n = 0
    per_utt = {}
    for uid in refs[0]:
        rates = [read_wav(t[uid])[0] for t in refs]
        r = [read_wav(t[uid])[1] for t in refs]
        e = [read_wav(t[uid])[1] for t in ests]
        ln = min(min(len(x) for x in r), min(len(x) for x in e))
        r = [x[:ln] for x in r]
        e = [x[:ln] for x in e]
        best = None
        for perm in permutations(range(n_spk)):
            score = np.mean([si_snr_np(e[i], r[p]) for i, p in enumerate(perm)])
            if best is None or score > best[0]:
                best = (score, perm)
        score, perm = best
        sdr_v = float(np.mean([sdr(e[i], r[p]) for i, p in enumerate(perm)]))
        per_utt[uid] = {"si_snr": score, "sdr": sdr_v}
        if args.stoi:
            from espnet_tpu.utils.stoi import stoi as stoi_fn

            stoi_v = float(
                np.mean(
                    [stoi_fn(r[p], e[i], rates[0]) for i, p in enumerate(perm)]
                )
            )
            per_utt[uid]["stoi"] = stoi_v
            totals["stoi"] += stoi_v
        if args.pesq:
            from espnet_tpu.utils.pesq import pesq as pesq_fn

            fs_in = rates[0]
            if fs_in in (8000, 16000):
                rp, ep, fs_p = r, e, fs_in
            else:
                # P.862 is defined at 8/16 kHz — resample (linear) to
                # 16 kHz rather than silently mis-scaling the filters
                fs_p = 16000
                logging.warning(
                    "%s: resampling %d Hz -> 16 kHz for PESQ", uid, fs_in
                )

                def _rs(x):
                    n2 = int(round(len(x) * fs_p / fs_in))
                    idx = np.linspace(0, len(x) - 1, n2)
                    return np.interp(idx, np.arange(len(x)), x)

                rp = [_rs(x) for x in r]
                ep = [_rs(x) for x in e]
            pesq_v = float(
                np.mean(
                    [pesq_fn(rp[p], ep[i], fs_p) for i, p in enumerate(perm)]
                )
            )
            per_utt[uid]["pesq"] = pesq_v
            totals["pesq"] += pesq_v
        if args.bss_eval:
            from espnet_tpu.utils.bss_eval import bss_eval_sources

            b_sdr, b_sir, b_sar, _ = bss_eval_sources(
                np.stack(r), np.stack(e), flen=args.bss_eval_flen
            )
            per_utt[uid].update(
                bss_sdr=float(b_sdr.mean()),
                bss_sir=float(b_sir.mean()),
                bss_sar=float(b_sar.mean()),
            )
            totals["bss_sdr"] += float(b_sdr.mean())
            totals["bss_sir"] += float(b_sir.mean())
            totals["bss_sar"] += float(b_sar.mean())
        totals["si_snr"] += score
        totals["sdr"] += sdr_v
        n += 1
    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    summary = {k: v / max(n, 1) for k, v in totals.items()}
    summary["num_utts"] = n
    if args.pesq:
        # no ITU P.862 binary exists in this environment to calibrate
        # the MOS mapping against — the value ranks systems but is not
        # an ITU-comparable absolute score (utils/pesq.py docstring)
        summary["pesq_note"] = "uncalibrated (own P.862 approximation)"
    (out / "summary.json").write_text(json.dumps(summary))
    with open(out / "per_utt.json", "w") as f:
        json.dump(per_utt, f, indent=1)
    logging.info("SI-SNR %.2f dB, SDR %.2f dB over %d utts",
                 summary["si_snr"], summary["sdr"], n)
    return summary


if __name__ == "__main__":
    main()
