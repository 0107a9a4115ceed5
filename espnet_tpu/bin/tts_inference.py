"""TTS inference: Text2Speech (reference: espnet2/bin/tts_inference.py:34
Text2Speech + Griffin-Lim vocoder :120)."""
from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np


class Text2Speech:
    def __init__(
        self,
        model,
        variables,
        token_list: List[str],
        fs: int = 16000,
        n_fft: int = 1024,
        hop_length: int = 256,
        n_mels: int = 80,
        fmin: float = 80.0,
        fmax: float = 7600.0,
        griffin_lim_iters: int = 32,
        **inference_kw,
    ):
        self.model = model
        self.variables = variables
        self.token_list = token_list
        self.token2id = {t: i for i, t in enumerate(token_list)}
        self.vocoder_conf = dict(
            fs=fs, n_fft=n_fft, hop_length=hop_length, n_mels=n_mels,
            fmin=fmin, fmax=fmax, n_iter=griffin_lim_iters,
        )
        self.inference_kw = inference_kw

    def __call__(self, text_ids: np.ndarray, lengths: Optional[np.ndarray] = None):
        """(B, L) token ids → (mel feats, lengths, waveforms)."""
        text_ids = jnp.asarray(text_ids)
        if lengths is None:
            lengths = np.full(text_ids.shape[0], text_ids.shape[1], np.int32)
        feats, olens = self.model.apply(
            self.variables,
            text_ids,
            jnp.asarray(lengths),
            method="synthesize",
            rngs={"dropout": jax.random.PRNGKey(0)},
            **self.inference_kw,
        )
        from espnet_tpu.ops.griffin_lim import logmel_to_wav

        wav = logmel_to_wav(feats, **self.vocoder_conf)
        return np.asarray(feats), np.asarray(olens), np.asarray(wav)


def main(argv=None):
    from espnet_tpu.utils.env import apply_jax_platform_env

    apply_jax_platform_env()
    argv = list(sys.argv[1:] if argv is None else argv)
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--text", required=True, help="text scp (uttid sentence)")
    parser.add_argument("--config", required=True)
    parser.add_argument("--ckpt", required=True)
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--fs", type=int, default=16000)
    parser.add_argument("--maxlenratio", type=float, default=10.0,
                        help="decoder frame cap = maxlenratio * text len "
                        "(reference inference maxlenratio; raise for "
                        "corpora with long per-token durations — if "
                        "output lengths saturate at the cap, synthesis "
                        "was truncated mid-utterance)")
    parser.add_argument("--minlenratio", type=float, default=0.0)
    parser.add_argument("--threshold", type=float, default=0.5,
                        help="stop-token probability threshold")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    from espnet_tpu.data.kaldi_io import read_scp
    from espnet_tpu.data.wav import write_wav
    from espnet_tpu.tasks.asr import build_preprocessor
    from espnet_tpu.tasks.tts import build_model_from_file
    from espnet_tpu.utils.config import load_yaml

    config = load_yaml(args.config)
    model, variables, token_list = build_model_from_file(args.config, args.ckpt)
    pre = build_preprocessor(config, token_list)
    fe = config.get("feats_extract_conf", {})
    t2s = Text2Speech(
        model, variables, token_list,
        fs=fe.get("fs", args.fs), n_fft=fe.get("n_fft", 1024),
        hop_length=fe.get("hop_length", 256), n_mels=fe.get("n_mels", 80),
        # match the ANALYSIS filterbank (log_mel_spectrogram defaults) so
        # the Griffin-Lim inverse uses the same mel basis as training
        fmin=fe.get("fmin", 0.0), fmax=fe.get("fmax", None),
        maxlenratio=args.maxlenratio, minlenratio=args.minlenratio,
        threshold=args.threshold,
    )
    out = Path(args.output_dir)
    (out / "wav").mkdir(parents=True, exist_ok=True)
    for uid, sent in read_scp(args.text).items():
        data = pre(uid, {"text": sent})
        feats, olens, wav = t2s(data["text"][None])
        # a barely-trained model can emit stop at step 0 — always write
        # at least one frame so downstream consumers (MCD, players)
        # never see an empty file
        n = max(int(olens[0]), 1) * fe.get("hop_length", 256)
        write_wav(out / "wav" / f"{uid}.wav", fe.get("fs", args.fs), wav[0][:n])
        logging.info("%s: %d frames", uid, int(olens[0]))


if __name__ == "__main__":
    main()
