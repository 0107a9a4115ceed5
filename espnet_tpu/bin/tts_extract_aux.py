"""CLI: extract FastSpeech2 training targets — teacher durations (from a
trained Tacotron2's attention), token-averaged pitch and energy
(reference: teacher-forcing stage of egs2 tts.sh + fastspeech2 extractors
espnet2/tts/feats_extract/{dio,energy}.py).

Outputs (scp-style, consumable as data triplets):
  durations  — "uttid d1 d2 ..." (text_int)
  pitch.scp / energy.scp — npy files per utt (npy)
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
                        help="path,name,type (wav.scp,speech,sound + text,text,text)")
    parser.add_argument("--teacher_config", required=True)
    parser.add_argument("--teacher_ckpt", required=True)
    parser.add_argument("--output_dir", required=True)
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    import jax
    import jax.numpy as jnp

    from espnet_tpu.data.dataset import ESPnetDataset, common_collate
    from espnet_tpu.data.kaldi_io import write_scp
    from espnet_tpu.ops.pitch import average_by_duration, extract_energy, extract_f0
    from espnet_tpu.tasks.asr import build_preprocessor
    from espnet_tpu.tasks.tts import build_model_from_file
    from espnet_tpu.utils.config import load_yaml

    config = load_yaml(args.teacher_config)
    model, variables, token_list = build_model_from_file(
        args.teacher_config, args.teacher_ckpt
    )
    pre = build_preprocessor(config, token_list)
    fe = config.get("feats_extract_conf", {})
    fs = fe.get("fs", 16000)
    hop = fe.get("hop_length", 256)
    win = fe.get("n_fft", 1024)

    data = [tuple(s.split(",")) for s in args.data]
    ds = ESPnetDataset(data, preprocessor=pre)
    out = Path(args.output_dir)
    (out / "pitch").mkdir(parents=True, exist_ok=True)
    (out / "energy").mkdir(parents=True, exist_ok=True)
    dur_scp, pitch_scp, energy_scp = {}, {}, {}
    for uid in ds.keys:
        s = ds[uid]
        wav = s["speech"]
        text = s["text"]
        batch = common_collate([s], bucket=False)
        dur, feat_lens = model.apply(
            variables,
            jnp.asarray(batch["text"]), jnp.asarray(batch["text_lengths"]),
            jnp.asarray(batch["speech"]), jnp.asarray(batch["speech_lengths"]),
            method="teacher_alignment",
            rngs={"dropout": jax.random.PRNGKey(0)},
        )
        dur = np.asarray(dur[0])[: len(text)]
        f0 = extract_f0(wav, fs=fs, frame_shift=hop, frame_length=win)
        en = extract_energy(wav, frame_shift=hop, frame_length=win)
        n = int(np.asarray(feat_lens[0]))
        pitch_tok = average_by_duration(f0[:n], dur)
        energy_tok = average_by_duration(en[:n], dur)
        np.save(out / "pitch" / f"{uid}.npy", pitch_tok)
        np.save(out / "energy" / f"{uid}.npy", energy_tok)
        dur_scp[uid] = " ".join(str(int(d)) for d in dur)
        pitch_scp[uid] = str(out / "pitch" / f"{uid}.npy")
        energy_scp[uid] = str(out / "energy" / f"{uid}.npy")
    write_scp(out / "durations", dur_scp)
    write_scp(out / "pitch.scp", pitch_scp)
    write_scp(out / "energy.scp", energy_scp)
    logging.info("extracted aux targets for %d utts -> %s", len(dur_scp), out)


if __name__ == "__main__":
    main()
