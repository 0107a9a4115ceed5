#!/usr/bin/env bash
# mini_an4 2-speaker mixture ASR recipe on REAL AN4 speech (analog of
# egs/mini_an4/asr_mix1): mixture generation → PIT CTC training →
# per-branch greedy decode → permutation-free WER.
#
#   ./run_mix.sh [--stage N] [--stop_stage M]
set -euo pipefail
cd "$(dirname "$0")"
export PYTHONPATH="$(cd ../..; pwd):${PYTHONPATH:-}"

stage=0
stop_stage=3
tarball=/root/reference/egs/mini_an4/asr1/downloads.tar.gz
expdir=exp
datadir=data
while [ $# -gt 0 ]; do
  case "$1" in
    --stage) stage=$2; shift 2;;
    --stop_stage) stop_stage=$2; shift 2;;
    --tarball) tarball=$2; shift 2;;
    *) echo "unknown option $1"; exit 1;;
  esac
done

tokens=$datadir/tokens.txt

if [ $stage -le 0 ] && [ $stop_stage -ge 0 ]; then
  echo "=== stage 0: data prep + mixture generation"
  python local/data_prep.py --tarball "$tarball" --workdir .
  python local/make_mixtures.py --src $datadir/train \
    --out $datadir/train_mix --wav_out $datadir/wav_mix
  python local/make_mixtures.py --src $datadir/test \
    --out $datadir/test_mix --wav_out $datadir/wav_mix_test
fi

if [ $stage -le 1 ] && [ $stop_stage -ge 1 ]; then
  echo "=== stage 1: token list (char, over both speakers' text)"
  cat $datadir/train_mix/text_spk1 $datadir/train_mix/text_spk2 | \
    python -m espnet_tpu.bin.tokenize_text \
      -i - -o $tokens -f 2- -t char --write_vocabulary true \
      --add_symbol '<blank>:0' --add_symbol '<unk>:1' --add_symbol '<sos/eos>:-1'
fi

if [ $stage -le 2 ] && [ $stop_stage -ge 2 ]; then
  echo "=== stage 2: PIT CTC training"
  python -m espnet_tpu.bin.asr_train \
    --train_data $datadir/train_mix/wav.scp,speech,sound \
    --train_data $datadir/train_mix/text_spk1,text_spk1,text \
    --train_data $datadir/train_mix/text_spk2,text_spk2,text \
    --valid_data $datadir/train_mix/wav.scp,speech,sound \
    --valid_data $datadir/train_mix/text_spk1,text_spk1,text \
    --valid_data $datadir/train_mix/text_spk2,text_spk2,text \
    --token_list $tokens --expdir $expdir/asr_mix --stats_dir $expdir/mix_stats \
    --config conf/train_pit.yaml
fi

if [ $stage -le 3 ] && [ $stop_stage -ge 3 ]; then
  echo "=== stage 3: decode + permutation-free WER"
  for rtask in train_mix test_mix; do
    python -m espnet_tpu.bin.asr_recog \
      --data $datadir/$rtask/wav.scp,speech,sound \
      --text $datadir/$rtask/text_ref \
      --config $expdir/asr_mix/config.yaml \
      --ckpt $expdir/asr_mix/latest.ckpt \
      --output_dir $expdir/asr_mix/decode_$rtask --batch_size 2
    cat $expdir/asr_mix/decode_$rtask/summary.json; echo
  done
fi

if [ $stage -le 4 ] && [ $stop_stage -ge 4 ]; then
  echo "=== stage 4: joint enhancement+ASR training (espnet_joint_model parity)"
  python -m espnet_tpu.bin.enh_asr_train \
    --train_data $datadir/train_mix/wav.scp,speech_mix,sound \
    --train_data $datadir/train_mix/spk1.scp,speech_ref1,sound \
    --train_data $datadir/train_mix/spk2.scp,speech_ref2,sound \
    --train_data $datadir/train_mix/text_spk1,text_spk1,text \
    --train_data $datadir/train_mix/text_spk2,text_spk2,text \
    --valid_data $datadir/train_mix/wav.scp,speech_mix,sound \
    --valid_data $datadir/train_mix/spk1.scp,speech_ref1,sound \
    --valid_data $datadir/train_mix/spk2.scp,speech_ref2,sound \
    --valid_data $datadir/train_mix/text_spk1,text_spk1,text \
    --valid_data $datadir/train_mix/text_spk2,text_spk2,text \
    --token_list $tokens --expdir $expdir/enh_asr \
    --config conf/train_enh_asr.yaml
  python - <<'PY'
import json, re
from pathlib import Path
log = (Path("exp/enh_asr") / "report.json")
if log.exists():
    rep = json.loads(log.read_text())
    last = rep[-1] if isinstance(rep, list) else rep
    print("enh_asr final epoch stats:", json.dumps(last)[:400])
PY
fi
