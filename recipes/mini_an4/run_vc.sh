#!/usr/bin/env bash
# mini_an4 VC recipe on REAL AN4 speech: parallel spectrogram→spectrogram
# conversion trained on (source, target) = (utterance, same utterance) —
# an identity-reconstruction pipeline exercise in the spirit of the
# reference's other mini_an4 recipes (st1 "translates" to a lowercase
# copy). Drives vc_train/vc_decode end-to-end on real audio; use
# parallel two-speaker corpora (arctic-style) for a real conversion task.
#
#   ./run_vc.sh [--stage N] [--stop_stage M] [--vc_model tacotron2|transformer]
# NOTE: the transformer (VTN) variant trains through this recipe, but its
# autoregressive inference re-runs a growing prefix per frame (no scan),
# so full-utterance CPU decode is slow — use tacotron2 for the decode
# stage on CPU, or small maxlenratio.
set -euo pipefail
cd "$(dirname "$0")"
export PYTHONPATH="$(cd ../..; pwd):${PYTHONPATH:-}"

stage=0
stop_stage=2
vc_model=tacotron2
while [ $# -gt 0 ]; do
  case "$1" in
    --stage) stage=$2; shift 2;;
    --stop_stage) stop_stage=$2; shift 2;;
    --vc_model) vc_model=$2; shift 2;;
    *) echo "unknown option $1"; exit 1;;
  esac
done

train_set=data/train_nodev
fc='{"fs": 16000, "n_fft": 512, "hop_length": 160, "n_mels": 40}'
vcc='{"econv_chans": 32, "blstm_units": 32, "dunits": 64, "dlayers": 1,
      "prenet_units": 16, "postnet_chans": 16, "att_dim": 16}'
[ "$vc_model" = transformer ] && vcc='{"adim": 32, "aheads": 4, "elayers": 1,
      "eunits": 64, "dlayers": 1, "dunits": 64, "prenet_units": 16,
      "postnet_layers": 2}'

if [ $stage -le 0 ] && [ $stop_stage -ge 0 ]; then
  echo "=== stage 0: feats stats"
  [ -f $train_set/wav.scp ] || { echo "run ./run.sh first (data prep)"; exit 1; }
  python -m espnet_tpu.bin.vc_train \
    --train_data $train_set/wav.scp,src_speech,sound \
    --train_data $train_set/wav.scp,speech,sound \
    --collect_stats true --stats_dir exp/vc_stats \
    --feats_extract_conf "$fc" --expdir exp/vc
fi

if [ $stage -le 1 ] && [ $stop_stage -ge 1 ]; then
  echo "=== stage 1: VC training ($vc_model)"
  python -m espnet_tpu.bin.vc_train \
    --train_data $train_set/wav.scp,src_speech,sound \
    --train_data $train_set/wav.scp,speech,sound \
    --valid_data $train_set/wav.scp,src_speech,sound \
    --valid_data $train_set/wav.scp,speech,sound \
    --expdir exp/vc --stats_dir exp/vc_stats \
    --max_epoch 300 --batch_size 4 \
    --feats_extract_conf "$fc" --vc_conf "$vcc" --vc_model "$vc_model" \
    --optim_conf '{"lr": 0.002}'
fi

if [ $stage -le 2 ] && [ $stop_stage -ge 2 ]; then
  echo "=== stage 2: conversion (Griffin-Lim) + MCD vs target"
  python -m espnet_tpu.bin.vc_decode \
    --data $train_set/wav.scp,src_speech,sound \
    --config exp/vc/config.yaml --ckpt exp/vc/latest.ckpt \
    --output_dir exp/vc/decode --maxlenratio 1.2 --griffin_lim_iters 16
  python - <<'PYEOF'
from pathlib import Path
lines = [f"{w.stem} {w.resolve()}" for w in sorted(Path('exp/vc/decode').glob('*.wav'))]
Path('exp/vc/decode/hyp_wav.scp').write_text("\n".join(lines) + "\n")
PYEOF
  python -m espnet_tpu.bin.mcd_calculate \
    --ref $train_set/wav.scp --hyp exp/vc/decode/hyp_wav.scp \
    --fs 16000 --n_fft 512 --hop_length 160 \
    --out exp/vc/decode/mcd.json
  cat exp/vc/decode/mcd.json | head -3
fi
