"""CLI: voice conversion decoding (reference: espnet/bin/vc_decode.py →
espnet/vc/pytorch_backend/vc.py decode).

Converts source-speaker wavs to target-speaker log-mels, then
Griffin-Lim to wav: <output_dir>/<uttid>.wav + feats npy.
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
                        help="path,name,type (source wav scp: wav.scp,src_speech,sound)")
    parser.add_argument("--config", required=True)
    parser.add_argument("--ckpt", required=True)
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--threshold", type=float, default=0.5)
    parser.add_argument("--maxlenratio", type=float, default=3.0)
    parser.add_argument("--minlenratio", type=float, default=0.0)
    parser.add_argument("--griffin_lim_iters", type=int, default=32)
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    import jax
    import jax.numpy as jnp

    from espnet_tpu.data.dataset import ESPnetDataset, common_collate
    from espnet_tpu.data.wav import write_wav
    from espnet_tpu.ops.griffin_lim import logmel_to_wav
    from espnet_tpu.tasks.vc import build_model_from_file

    model, variables, config = build_model_from_file(args.config, args.ckpt)
    fc = config.get("feats_extract_conf", {})

    convert = jax.jit(
        lambda wav, lens: model.apply(
            variables, wav, lens, method="convert",
            threshold=args.threshold, maxlenratio=args.maxlenratio,
            minlenratio=args.minlenratio,
            rngs={"dropout": jax.random.PRNGKey(0)},
        )
    )

    data = [tuple(s.split(",")) for s in args.data]
    ds = ESPnetDataset(data)
    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    for k in ds.keys:
        batch = common_collate([ds[k]])
        feats, olens = convert(
            jnp.asarray(batch["src_speech"]),
            jnp.asarray(batch["src_speech_lengths"]),
        )
        n = int(olens[0])
        feats = np.asarray(feats)[0]
        feats = feats[:n] if n > 0 else feats  # n==0: stop fired at step 1
        np.save(out / f"{k}.npy", feats)
        wav = logmel_to_wav(
            feats[None],
            fs=fc.get("fs", 16000),
            n_fft=fc.get("n_fft", 1024),
            hop_length=fc.get("hop_length", 256),
            n_mels=fc.get("n_mels", 80),
            fmin=fc.get("fmin", 80.0),
            fmax=fc.get("fmax", 7600.0),
            n_iter=args.griffin_lim_iters,
        )
        write_wav(out / f"{k}.wav", fc.get("fs", 16000), np.asarray(wav)[0])
        logging.info("%s: %d frames -> %s", k, feats.shape[0], out / f"{k}.wav")


if __name__ == "__main__":
    main()
