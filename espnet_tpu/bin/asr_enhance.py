"""CLI: speech enhancement through the ASR beamformer frontend
(reference: espnet/bin/asr_enhance.py → asr.py enhance:1149).

Runs multi-channel input through the trained model's WPE→MVDR frontend
and writes enhanced single-channel wavs.
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
                        help="path,name,type (wav.scp,speech,multichannel_sound)")
    parser.add_argument("--config", required=True,
                        help="ASR train config.yaml (frontend: beamformer)")
    parser.add_argument("--ckpt", required=True)
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--fs", type=int, default=16000)
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    import jax
    import jax.numpy as jnp

    from espnet_tpu.data.dataset import ESPnetDataset, common_collate
    from espnet_tpu.data.wav import write_wav
    from espnet_tpu.tasks.asr import build_model_from_file
    from espnet_tpu.utils.config import load_yaml

    config = load_yaml(args.config)
    if config.get("frontend") != "beamformer":
        raise SystemExit("asr_enhance needs a model trained with frontend: beamformer")
    model, variables, _ = build_model_from_file(args.config, args.ckpt)
    frontend_vars = {"params": variables["params"]["frontend"]}

    enhance = jax.jit(
        lambda s, l: model.frontend.apply(
            frontend_vars, s, l, return_wave=True
        )
    )

    ds = ESPnetDataset([tuple(s.split(",")) for s in args.data])
    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    for k in ds.keys:
        batch = common_collate([ds[k]])
        wav, flens = enhance(
            jnp.asarray(batch["speech"]), jnp.asarray(batch["speech_lengths"])
        )
        n = min(int(batch["speech_lengths"][0]), wav.shape[1])
        write_wav(out / f"{k}.wav", args.fs, np.asarray(wav)[0, :n])
        logging.info("%s enhanced -> %s", k, out / f"{k}.wav")


if __name__ == "__main__":
    main()
