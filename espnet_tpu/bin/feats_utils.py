"""Kaldi-featbin-style feature utilities in one CLI.

Reference parity: utils/compute-fbank-feats.py, compute-cmvn-stats.py
(via utils/Makefile-built Kaldi binaries in the reference recipes),
apply-cmvn.py and copy-feats.py (espnet/utils/ §2.8). One subcommand
per tool so espnet1-style dump-stage recipes can be expressed:

  python -m espnet_tpu.bin.feats_utils fbank  --scp wav.scp --out_ark f.ark --out_scp f.scp
  python -m espnet_tpu.bin.feats_utils cmvn   --scp f.scp --out cmvn.ark
  python -m espnet_tpu.bin.feats_utils apply-cmvn --scp f.scp --cmvn cmvn.ark --out_ark d.ark --out_scp d.scp
  python -m espnet_tpu.bin.feats_utils copy   --scp f.scp --out_ark c.ark --out_scp c.scp
"""
from __future__ import annotations

import argparse

import numpy as np

from espnet_tpu.data.kaldi_io import (
    ArkScpWriter,
    load_scp_entry,
    read_cmvn_stats,
    read_scp,
    write_cmvn_stats,
)
from espnet_tpu.data.transform import fbank
from espnet_tpu.data.wav import read_audio


def _iter_scp(path):
    for key, rx in read_scp(path).items():
        yield key, rx


def cmd_fbank(args):
    with ArkScpWriter(args.out_ark, args.out_scp) as w:
        for key, rx in _iter_scp(args.scp):
            rate, audio = read_audio(rx)
            feats = fbank(
                audio,
                fs=rate,
                n_mels=args.n_mels,
                n_fft=args.n_fft,
                hop_length=args.n_shift,
            )
            if getattr(args, "pitch", False):
                # fbank_pitch parity: 80 fbank + 3 pitch = 83 dims
                # (espnet1 steps/make_fbank_pitch.sh, SURVEY A.6)
                from espnet_tpu.ops.pitch import pitch_feats

                p = pitch_feats(
                    np.asarray(audio, np.float64),
                    fs=rate,
                    frame_shift=args.n_shift,
                    frame_length=args.n_fft,
                )
                n = min(len(feats), len(p))
                feats = np.concatenate([feats[:n], p[:n]], axis=1)
            w[key] = feats.astype(np.float32)


def cmd_cmvn(args):
    count, s, sq = 0.0, None, None
    for key, rx in _iter_scp(args.scp):
        m = load_scp_entry(rx)
        count += m.shape[0]
        s = m.sum(0) if s is None else s + m.sum(0)
        sq = (m**2).sum(0) if sq is None else sq + (m**2).sum(0)
    if s is None:
        raise SystemExit("empty scp: no features to accumulate")
    write_cmvn_stats(args.out, count, s, sq)


def cmd_apply_cmvn(args):
    count, s, sq = read_cmvn_stats(args.cmvn)
    mean = s / count
    std = np.sqrt(np.maximum(sq / count - mean**2, 1e-20))
    with ArkScpWriter(args.out_ark, args.out_scp) as w:
        for key, rx in _iter_scp(args.scp):
            m = load_scp_entry(rx)
            out = (m - mean) / std if args.norm_vars else m - mean
            w[key] = out.astype(np.float32)


def cmd_copy(args):
    with ArkScpWriter(args.out_ark, args.out_scp) as w:
        for key, rx in _iter_scp(args.scp):
            w[key] = load_scp_entry(rx).astype(np.float32)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("fbank", help="wav.scp -> log-mel fbank ark/scp")
    p.add_argument("--scp", required=True)
    p.add_argument("--out_ark", required=True)
    p.add_argument("--out_scp", required=True)
    p.add_argument("--n_mels", type=int, default=80)
    p.add_argument("--n_fft", type=int, default=512)
    p.add_argument("--n_shift", type=int, default=128)
    p.add_argument(
        "--pitch",
        action="store_true",
        help="append 3 Kaldi-style pitch dims (POV, norm log-F0, delta)",
    )
    p.set_defaults(fn=cmd_fbank)

    p = sub.add_parser("cmvn", help="accumulate global CMVN stats")
    p.add_argument("--scp", required=True)
    p.add_argument("--out", required=True)
    p.set_defaults(fn=cmd_cmvn)

    p = sub.add_parser("apply-cmvn", help="normalize features by stats")
    p.add_argument("--scp", required=True)
    p.add_argument("--cmvn", required=True)
    p.add_argument("--out_ark", required=True)
    p.add_argument("--out_scp", required=True)
    p.add_argument("--norm_vars", action="store_true", default=True)
    p.set_defaults(fn=cmd_apply_cmvn)

    p = sub.add_parser("copy", help="copy features (scp -> new ark/scp)")
    p.add_argument("--scp", required=True)
    p.add_argument("--out_ark", required=True)
    p.add_argument("--out_scp", required=True)
    p.set_defaults(fn=cmd_copy)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
