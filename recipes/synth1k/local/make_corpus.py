"""synth1k corpus: formant-synthesized spelled-word 'speech' at a scale
that demonstrates *learning* (reference evidence shape:
egs/an4/asr1/RESULTS — held-out WER, LM fusion, beam/ctc ablations).

The full AN4 corpus is not available in this environment (the bundled
mini_an4 tarball carries 8 audio files), so this synthesizer produces an
AN4-shaped task — sequences of spelled letters and digits — with enough
acoustic structure that a real acoustic model is required:

- source-filter synthesis: harmonic source (per-speaker f0 contour with
  declination + jitter) plus spectrally-shaped noise, filtered through
  per-phone formant envelopes (Gaussian resonance bumps);
- a 40-phone-ish inventory reduced to 28 phones covering vowels,
  nasals, liquids, fricatives and stops (closure + burst);
- coarticulation: formant targets are interpolated across phone
  boundaries with 40 ms transitions, so letters sound different in
  context (the model cannot template-match segments);
- speaker variation: 30 speakers (f0 90–250 Hz, vocal-tract length
  scaling ±12 %, speaking rate 0.8–1.25×); dev/test speakers are HELD
  OUT, so WER measures generalization across speakers and sequences;
- channel/noise: white noise at 15–25 dB SNR, random utterance gain.

Splits: train 1500 / dev 150 / test 150 utterances by default
(--n_train scales the train split for learning-curve ablations).
"""
from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

FS = 8000
NYQ = FS / 2.0

# phone -> (F1, F2, F3, voiced, kind, base_dur_s, amp)
# kind: v=vowel/sonorant, n=nasal, f=fricative, s=stop
PHONES = {
    "iy": (270, 2290, 3010, 1.0, "v", 0.24, 1.0),
    "ih": (390, 1990, 2550, 1.0, "v", 0.20, 1.0),
    "eh": (530, 1840, 2480, 1.0, "v", 0.22, 1.0),
    "ae": (660, 1720, 2410, 1.0, "v", 0.26, 1.0),
    "aa": (730, 1090, 2440, 1.0, "v", 0.26, 1.0),
    "ao": (570, 840, 2410, 1.0, "v", 0.26, 1.0),
    "uw": (300, 870, 2240, 1.0, "v", 0.24, 1.0),
    "ah": (640, 1190, 2390, 1.0, "v", 0.20, 1.0),
    "ax": (500, 1500, 2500, 1.0, "v", 0.12, 0.8),
    "er": (490, 1350, 1690, 1.0, "v", 0.22, 1.0),
    "ey": (480, 2100, 2600, 1.0, "v", 0.26, 1.0),
    "ay": (620, 1600, 2500, 1.0, "v", 0.30, 1.0),
    "ow": (540, 950, 2400, 1.0, "v", 0.26, 1.0),
    "l": (360, 1300, 2700, 1.0, "v", 0.14, 0.7),
    "r": (310, 1060, 1380, 1.0, "v", 0.16, 0.7),
    "w": (290, 610, 2150, 1.0, "v", 0.14, 0.7),
    "y": (260, 2070, 3020, 1.0, "v", 0.12, 0.7),
    "m": (280, 900, 2200, 1.0, "n", 0.16, 0.5),
    "n": (280, 1700, 2600, 1.0, "n", 0.16, 0.5),
    "s": (0, 3200, 3800, 0.0, "f", 0.20, 0.40),
    "sh": (0, 2200, 3000, 0.0, "f", 0.20, 0.45),
    "f": (0, 1500, 3500, 0.0, "f", 0.18, 0.25),
    "th": (0, 1800, 3600, 0.0, "f", 0.16, 0.22),
    "v": (250, 1500, 3500, 0.6, "f", 0.14, 0.4),
    "z": (250, 3200, 3800, 0.6, "f", 0.18, 0.45),
    "hh": (500, 1500, 2500, 0.0, "f", 0.12, 0.18),
    # stops: (burst-locus F2/F3); closure handled in synth
    "p": (0, 800, 2000, 0.0, "s", 0.18, 0.5),
    "b": (150, 800, 2000, 0.4, "s", 0.16, 0.5),
    "t": (0, 2800, 3400, 0.0, "s", 0.18, 0.55),
    "d": (150, 2500, 3200, 0.4, "s", 0.16, 0.55),
    "k": (0, 1800, 2600, 0.0, "s", 0.18, 0.55),
    "g": (150, 1800, 2600, 0.4, "s", 0.16, 0.55),
}

# spelled-letter + digit lexicon (AN4's task shape: an4.dic)
LEXICON = {
    "A": "ey", "B": "b iy", "C": "s iy", "D": "d iy", "E": "iy",
    "F": "eh f", "G": "d sh iy", "H": "ey t sh", "I": "aa iy",
    "J": "d sh ey", "K": "k ey", "L": "eh l", "M": "eh m", "N": "eh n",
    "O": "ow", "P": "p iy", "Q": "k y uw", "R": "aa r", "S": "eh s",
    "T": "t iy", "U": "y uw", "V": "v iy", "W": "d ah b ax l y uw",
    "X": "eh k s", "Y": "w ay", "Z": "z iy",
    "ZERO": "z iy r ow", "ONE": "w ah n", "TWO": "t uw",
    "THREE": "th r iy", "FOUR": "f ao r", "FIVE": "f ay v",
    "SIX": "s ih k s", "SEVEN": "s eh v ax n", "EIGHT": "ey t",
    "NINE": "n ay n",
}
WORDS = sorted(LEXICON)


def _f0_contour(n, f0_base, rng):
    """Declining f0 with slow jitter, per-sample (Hz)."""
    t = np.arange(n) / FS
    decl = f0_base * (1.0 - 0.15 * t / max(t[-1], 0.5))
    slow = 1.0 + 0.03 * np.sin(2 * np.pi * (2.5 + rng.rand()) * t + rng.rand() * 6)
    return decl * slow


def _phone_track(phones, rate, rng, formant_scale):
    """Per-frame (10 ms) formant/voicing/amp/kind tracks with 40 ms
    coarticulation transitions. Returns dict of per-frame arrays."""
    hop = 0.010
    segs = []  # (phone, n_frames)
    for ph in phones:
        f1, f2, f3, voiced, kind, dur, amp = PHONES[ph]
        dur = dur * rate * (0.85 + 0.3 * rng.rand())
        segs.append((ph, max(int(round(dur / hop)), 3)))
    total = sum(n for _, n in segs)
    F = np.zeros((total, 3))
    voic = np.zeros(total)
    amp = np.zeros(total)
    burst = np.zeros(total, dtype=bool)
    pos = 0
    centers = []
    for ph, n in segs:
        f1, f2, f3, v, kind, _, a = PHONES[ph]
        centers.append((pos + n // 2, np.array([f1, f2, f3]) * formant_scale, v, a, kind, pos, n))
        pos += n
    # piecewise-linear formant interpolation between phone centers
    cidx = np.array([c[0] for c in centers])
    cF = np.stack([c[1] for c in centers])
    cV = np.array([c[2] for c in centers])
    frames = np.arange(total)
    for k in range(3):
        F[:, k] = np.interp(frames, cidx, cF[:, k])
    voic = np.interp(frames, cidx, cV)
    # per-segment CONSTANT formant targets for the noise-shaping path
    # (fricatives/bursts must keep their own spectrum, not a glide)
    Fn = np.zeros((total, 3))
    for _, fc, v, a, kind, p0, n in centers:
        Fn[p0: p0 + n] = fc
    # amplitude / stop structure per segment
    for _, fc, v, a, kind, p0, n in centers:
        if kind == "s":
            ncl = max(int(n * 0.55), 2)  # closure
            amp[p0: p0 + ncl] = 0.02
            burst[p0 + ncl: p0 + ncl + 2] = True
            amp[p0 + ncl: p0 + n] = a
            voic[p0: p0 + ncl] *= 0.2
        else:
            env = np.ones(n) * a
            # soft 20ms on/offset ramps inside the segment
            r = min(2, n // 2)
            if r:
                env[:r] *= np.linspace(0.5, 1.0, r)
                env[-r:] *= np.linspace(1.0, 0.6, r)
            amp[p0: p0 + n] = env
    return {
        "F": F, "Fnoise": Fn, "voiced": np.clip(voic, 0, 1),
        "amp": amp, "burst": burst,
    }


def _formant_env(freqs, F, scale_bw=1.0):
    """Spectral envelope on `freqs` (Hz) from 3 Gaussian resonances +
    soft low-pass tilt. F: (3,) formant centers (0 = absent)."""
    env = np.full(freqs.shape, 0.03)
    bws = np.array([90.0, 120.0, 160.0]) * scale_bw
    gains = np.array([1.0, 0.63, 0.35])
    for f, bw, g in zip(F, bws, gains):
        if f > 1:
            env = env + g * np.exp(-0.5 * ((freqs - f) / bw) ** 2)
    # spectral tilt: -6 dB/octave above 500 Hz
    tilt = 1.0 / np.maximum(freqs / 500.0, 1.0)
    return env * tilt


def synth_utterance(words, rng, spk):
    """Render one utterance; returns float32 wav at FS."""
    f0_base, formant_scale, rate = spk
    hop = FS // 100  # 10 ms
    pieces = []
    for w in words:
        phones = LEXICON[w].split()
        tr = _phone_track(phones, rate, rng, formant_scale)
        n_frames = len(tr["amp"])
        n = n_frames * hop
        # --- voiced part: sum of harmonics under the formant envelope
        f0 = _f0_contour(n, f0_base * (0.95 + 0.1 * rng.rand()), rng)
        phase = 2 * np.pi * np.cumsum(f0) / FS
        n_harm = int(NYQ / np.max(f0) * 0.95)
        k = np.arange(1, n_harm + 1)
        # per-frame harmonic amplitudes from the envelope
        framesF = tr["F"]  # (n_frames, 3)
        harm_f = k[None, :] * f0[::hop, None]  # (n_frames, n_harm)
        amps = np.zeros_like(harm_f)
        for i in range(n_frames):
            amps[i] = _formant_env(harm_f[i], framesF[i])
        amps *= (harm_f < NYQ * 0.98)
        # upsample amplitudes to per-sample (linear)
        amps_s = np.empty((n, n_harm))
        fr = np.arange(n_frames) * hop
        xi = np.arange(n)
        for j in range(n_harm):
            amps_s[:, j] = np.interp(xi, fr, amps[:, j])
        voiced = (amps_s * np.sin(phase[:, None] * k[None, :])).sum(axis=1)
        voiced /= max(np.abs(voiced).max(), 1e-6)
        # --- noise part: STFT-shaped white noise. The shaping envelope
        # uses the PHONE'S OWN targets held constant per segment (tr
        # ["Fnoise"]) — interpolated targets made fricative spectra
        # glide between neighbours and blur s/sh/f identity
        noise = rng.randn(n)
        nfft = 256
        freqs = np.fft.rfftfreq(nfft, 1.0 / FS)
        shaped = np.zeros(n)
        win = np.hanning(nfft)
        step = nfft // 2
        norm = np.zeros(n)
        noiseF = tr.get("Fnoise", framesF)
        for i0 in range(0, n - nfft + 1, step):
            fi = min(i0 // hop, n_frames - 1)
            env = _formant_env(freqs, noiseF[fi], scale_bw=2.0)
            seg = np.fft.irfft(np.fft.rfft(noise[i0: i0 + nfft] * win) * env, nfft)
            shaped[i0: i0 + nfft] += seg * win
            norm[i0: i0 + nfft] += win ** 2
        shaped /= np.maximum(norm, 1e-3)
        shaped /= max(np.abs(shaped).max(), 1e-6)
        # --- mix by per-sample voicing/amp
        voic_s = np.repeat(tr["voiced"], hop)[:n]
        amp_s = np.repeat(tr["amp"], hop)[:n]
        burst_s = np.repeat(tr["burst"], hop)[:n]
        sig = amp_s * (voic_s * voiced + (1 - voic_s) * 0.9 * shaped)
        sig = sig + burst_s * 0.6 * rng.randn(n)  # stop-release click
        pieces.append(sig)
        # inter-word pause: long enough that word boundaries survive the
        # ×4 conv2d subsampling (CTC feasibility: T' >= 2·chars+1)
        pieces.append(np.zeros(int(FS * (0.10 + 0.10 * rng.rand()))))
    lead = np.zeros(int(FS * (0.05 + 0.05 * rng.rand())))
    wav = np.concatenate([lead] + pieces)
    # utterance gain + additive noise at 15–25 dB SNR
    wav = wav / max(np.abs(wav).max(), 1e-6) * (0.25 + 0.2 * rng.rand())
    snr_db = 20 + 10 * rng.rand()
    p_sig = np.mean(wav ** 2)
    noise = rng.randn(len(wav)) * np.sqrt(p_sig / (10 ** (snr_db / 10)))
    return (wav + noise).astype(np.float32)


def make_speakers(n, rng):
    spks = []
    for _ in range(n):
        f0 = 90 + 160 * rng.rand()
        fsc = 0.92 + 0.16 * rng.rand()
        rate = 0.85 + 0.3 * rng.rand()
        spks.append((f0, fsc, rate))
    return spks


def main():
    import sys

    sys.path.insert(0, str(Path(__file__).resolve().parents[3]))
    from espnet_tpu.data.kaldi_io import write_scp
    from espnet_tpu.data.wav import write_wav

    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--n_train", type=int, default=1500)
    p.add_argument("--n_dev", type=int, default=150)
    p.add_argument("--n_test", type=int, default=150)
    p.add_argument("--seed", type=int, default=7)
    args = p.parse_args()
    out = Path(args.out)

    rng = np.random.RandomState(args.seed)
    spks = make_speakers(30, rng)
    # speaker-disjoint splits: train 0–23, dev 24–26, test 27–29
    split_spk = {
        "train": list(range(24)),
        "dev": [24, 25, 26],
        "test": [27, 28, 29],
    }
    counts = {"train": args.n_train, "dev": args.n_dev, "test": args.n_test}
    for split in ["train", "dev", "test"]:
        srng = np.random.RandomState(args.seed + {"train": 1, "dev": 2, "test": 3}[split])
        d = out / split
        (d / "wav").mkdir(parents=True, exist_ok=True)
        wav_scp, text_scp, utt2spk = {}, {}, {}
        for i in range(counts[split]):
            spk_id = srng.choice(split_spk[split])
            k = srng.randint(2, 7)
            words = [WORDS[srng.randint(len(WORDS))] for _ in range(k)]
            uid = f"{split}_spk{spk_id:02d}_{i:04d}"
            wav = synth_utterance(words, srng, spks[spk_id])
            write_wav(d / "wav" / f"{uid}.wav", FS, wav)
            wav_scp[uid] = str((d / "wav" / f"{uid}.wav").resolve())
            text_scp[uid] = " ".join(words)
            utt2spk[uid] = f"spk{spk_id:02d}"
        write_scp(d / "wav.scp", wav_scp)
        write_scp(d / "text", text_scp)
        write_scp(d / "utt2spk", utt2spk)
        print(f"{split}: {counts[split]} utts, speakers {split_spk[split]}")

    from espnet_tpu.text.tokenizers import build_token_list

    texts = [
        line.split(" ", 1)[1]
        for line in (out / "train" / "text").read_text().splitlines()
    ]
    (out / "tokens.txt").write_text("\n".join(build_token_list(texts, "char")))
    print(f"synth1k data ready at {out}")


if __name__ == "__main__":
    main()
