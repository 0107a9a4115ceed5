"""Teacher-forced attention diagnostics on held-out utterances.

Loads a trained Tacotron2 TTS checkpoint, runs the teacher-forced
decoder on N held-out utterances, and records the evidence the
reference publishes as attention plots (espnet PlotAttentionReport,
espnet/asr/asr_utils.py): per-utterance attention heatmap PNGs plus a
diagonality summary:

- focus_rate: mean over valid decoder steps of max_j att(i, j)
  (1.0 = perfectly peaky) — the FastSpeech paper's focus-rate metric.
- monotonicity: fraction of valid steps whose argmax token index does
  not decrease (1.0 = strictly left-to-right alignment).

Usage: python local/att_diag.py --config ... --ckpt ... --data data/test
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def main():
    from espnet_tpu.utils.env import apply_jax_platform_env

    apply_jax_platform_env()
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--data", required=True, help="data dir (wav.scp + text)")
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from espnet_tpu.data.wav import read_audio
    from espnet_tpu.ops.stft import log_mel_spectrogram
    from espnet_tpu.tasks.tts import build_model_from_file
    from espnet_tpu.train.reporter import plot_attention
    from espnet_tpu.utils.config import load_yaml

    model, variables, _ = build_model_from_file(args.config, args.ckpt)
    config = load_yaml(args.config)
    token_list = config["token_list"]
    tok2id = {t: i for i, t in enumerate(token_list)}

    data = Path(args.data)
    wavs = dict(
        ln.split(None, 1) for ln in data.joinpath("wav.scp").read_text().splitlines()
    )
    texts = dict(
        ln.split(None, 1) for ln in data.joinpath("text").read_text().splitlines()
    )
    uids = sorted(texts)[: args.n]

    def att_fn(m, text, tl, speech, sl):
        conf = dict(m.feats_conf)
        feats, feat_lens = log_mel_spectrogram(speech, sl, **conf)
        feats = (feats - m.mean.value) / jnp.maximum(m.std.value, 1e-10)
        r = m.tts.reduction_factor
        pad = (-feats.shape[1]) % r
        if pad:
            feats = jnp.pad(feats, ((0, 0), (0, pad), (0, 0)))
        enc_h = m.tts.enc(text, tl, True)
        _, _, att_ws = m.tts._decode_teacher(enc_h, tl, feats, True)
        return att_ws, feat_lens

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    summary = {}
    focus_all, mono_all = [], []
    for uid in uids:
        fs, wav = read_audio(wavs[uid].strip())
        chars = list(texts[uid].strip())
        ids = np.array(
            [[tok2id.get(c, tok2id.get("<unk>", 1)) for c in chars]], np.int32
        )
        tl = np.array([ids.shape[1]], np.int32)
        speech = wav[None].astype(np.float32)
        sl = np.array([speech.shape[1]], np.int32)
        att_ws, feat_lens = model.apply(
            variables, jnp.asarray(ids), jnp.asarray(tl),
            jnp.asarray(speech), jnp.asarray(sl),
            method=att_fn, rngs={"dropout": jax.random.PRNGKey(0)},
        )
        r = model.tts.reduction_factor
        steps = int(feat_lens[0]) // r
        a = np.asarray(att_ws)[0, :steps, : int(tl[0])]  # (steps, L)
        focus = float(a.max(axis=-1).mean())
        am = a.argmax(axis=-1)
        mono = float(np.mean(np.diff(am) >= 0)) if len(am) > 1 else 1.0
        focus_all.append(focus)
        mono_all.append(mono)
        summary[uid] = {"focus_rate": round(focus, 4), "monotonicity": round(mono, 4)}
        plot_attention(a[None], out / f"{uid}.png", uid=uid)

    summary["mean"] = {
        "focus_rate": round(float(np.mean(focus_all)), 4),
        "monotonicity": round(float(np.mean(mono_all)), 4),
        "num_utts": len(uids),
    }
    (out / "diagonality.json").write_text(json.dumps(summary, indent=1))
    print(json.dumps(summary["mean"]))


if __name__ == "__main__":
    main()
