"""CLI: enhancement/separation inference (reference:
espnet2/bin/enh_inference.py SeparateSpeech).

Separates each mixture into n_spk wavs written to
<output_dir>/spk{n}/<uttid>.wav plus per-speaker scp files.
"""
from __future__ import annotations

import argparse
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
                        help="path,name,type (mixture scp: wav.scp,speech_mix,sound)")
    parser.add_argument("--config", required=True)
    parser.add_argument("--ckpt", required=True)
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--fs", type=int, default=16000)
    parser.add_argument("--batch_size", type=int, default=1)
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    import jax
    import jax.numpy as jnp

    from espnet_tpu.data.dataset import ESPnetDataset, common_collate
    from espnet_tpu.data.wav import write_wav
    from espnet_tpu.tasks.enh import build_model_from_file

    model, variables, config = build_model_from_file(args.config, args.ckpt)
    n_spk = config.get("n_spk", 2)
    separate = jax.jit(
        lambda mix, lens: model.apply(variables, mix, lens, method="separate")
    )

    data = [tuple(s.split(",")) for s in args.data]
    ds = ESPnetDataset(data)
    out = Path(args.output_dir)
    scps = {}
    for n in range(n_spk):
        (out / f"spk{n + 1}").mkdir(parents=True, exist_ok=True)
        scps[n] = open(out / f"spk{n + 1}.scp", "w")

    keys = ds.keys
    for i in range(0, len(keys), args.batch_size):
        kb = keys[i : i + args.batch_size]
        batch = common_collate([ds[k] for k in kb])
        outs, _ = separate(
            jnp.asarray(batch["speech_mix"]),
            jnp.asarray(batch["speech_mix_lengths"]),
        )
        est = np.stack([np.asarray(o) for o in outs], axis=1)  # (B, n_spk, L')
        lens = np.asarray(batch["speech_mix_lengths"])
        for b, k in enumerate(kb):
            for n in range(n_spk):
                wav_path = out / f"spk{n + 1}" / f"{k}.wav"
                write_wav(wav_path, args.fs, est[b, n, : min(lens[b], est.shape[-1])])
                scps[n].write(f"{k} {wav_path}\n")
            logging.info("%s separated into %d sources", k, n_spk)
    for f in scps.values():
        f.close()


if __name__ == "__main__":
    main()
