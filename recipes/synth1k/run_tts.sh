#!/usr/bin/env bash
# synth1k TTS — learning evidence at >1k-utt scale (VERDICT r3 #6):
# train Tacotron2 text→mel on the 1500-utt synthetic corpus, show the
# guided attention going diagonal on HELD-OUT utterances, and MCD of
# Griffin-Lim synthesis vs the real held-out wavs falling to a usable
# range. Evidence convention: egs/ljspeech/tts1/RESULTS.md.
#
#   ./run_tts.sh [--stage N] [--stop_stage M]
# Stages: 0 stats | 1 train | 2 attention diagonality (held-out) |
#         3 synthesize test subset + MCD
set -euo pipefail
cd "$(dirname "$0")"
export PYTHONPATH="$(cd ../..; pwd):${PYTHONPATH:-}"

stage=0
stop_stage=3
expdir=exp
datadir=data
n_synth=30   # held-out utterances to synthesize for MCD
while [ $# -gt 0 ]; do
  case "$1" in
    --stage) stage=$2; shift 2;;
    --stop_stage) stop_stage=$2; shift 2;;
    *) echo "unknown option $1"; exit 1;;
  esac
done

tokens=$datadir/tokens.txt
conf=conf/train_tacotron2.yaml
ttsdir=$expdir/tts_tacotron2

if [ $stage -le 0 ] && [ $stop_stage -ge 0 ]; then
  echo "=== stage 0: TTS feats stats"
  python -m espnet_tpu.bin.tts_train \
    --collect_stats true \
    --train_data $datadir/train/wav.scp,speech,sound \
    --train_data $datadir/train/text,text,text \
    --token_list $tokens --expdir $ttsdir --stats_dir $expdir/tts_stats \
    --config $conf
fi

if [ $stage -le 1 ] && [ $stop_stage -ge 1 ]; then
  echo "=== stage 1: Tacotron2 training (text -> mel, guided attention)"
  python -m espnet_tpu.bin.tts_train \
    --train_data $datadir/train/wav.scp,speech,sound \
    --train_data $datadir/train/text,text,text \
    --valid_data $datadir/dev/wav.scp,speech,sound \
    --valid_data $datadir/dev/text,text,text \
    --token_list $tokens --expdir $ttsdir --stats_dir $expdir/tts_stats \
    --config $conf
fi

if [ $stage -le 2 ] && [ $stop_stage -ge 2 ]; then
  echo "=== stage 2: teacher-forced attention on held-out test (plots + diagonality)"
  python local/att_diag.py \
    --config $ttsdir/config.yaml --ckpt $ttsdir/valid.loss.best.ckpt \
    --data $datadir/test --n 8 --out $ttsdir/att_test
  cat $ttsdir/att_test/diagonality.json; echo
fi

if [ $stage -le 3 ] && [ $stop_stage -ge 3 ]; then
  echo "=== stage 3: synthesize $n_synth held-out utts (Griffin-Lim) + MCD"
  head -$n_synth $datadir/test/text > $ttsdir/synth_text
  # maxlenratio 30: this corpus runs ~23 mel frames per character
  # (slow spelled speech); the reference default 10 truncates synthesis
  # mid-utterance (attention reached char 7/15 when the cap hit)
  python -m espnet_tpu.bin.tts_inference \
    --text $ttsdir/synth_text \
    --config $ttsdir/config.yaml \
    --ckpt $ttsdir/valid.loss.best.ckpt \
    --maxlenratio 30 \
    --output_dir $ttsdir/synth
  python - <<'PYEOF'
from pathlib import Path
lines = [f"{w.stem} {w.resolve()}"
         for w in sorted(Path('exp/tts_tacotron2/synth/wav').glob('*.wav'))]
Path('exp/tts_tacotron2/synth/hyp_wav.scp').write_text("\n".join(lines))
PYEOF
  # analysis params must match the corpus (8 kHz, 10 ms hop)
  python -m espnet_tpu.bin.mcd_calculate \
    --ref $datadir/test/wav.scp --hyp $ttsdir/synth/hyp_wav.scp \
    --fs 8000 --n_fft 256 --hop_length 80 \
    --out $ttsdir/synth/mcd.json
  cat $ttsdir/synth/mcd.json; echo
fi

echo "=== synth1k tts done"
