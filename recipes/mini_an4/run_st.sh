#!/usr/bin/env bash
# mini_an4 ST recipe on REAL AN4 speech (analog of egs/mini_an4/st1):
# like the reference, the "translation" target is the lowercase copy of
# the English transcript (st1/run.sh:122 `cp text text.lc`) — a pipeline
# exercise of speech→text translation with auxiliary ASR losses on real
# audio, not a linguistic task.
#
#   ./run_st.sh [--stage N] [--stop_stage M]
set -euo pipefail
cd "$(dirname "$0")"
export PYTHONPATH="$(cd ../..; pwd):${PYTHONPATH:-}"

stage=0
stop_stage=3
while [ $# -gt 0 ]; do
  case "$1" in
    --stage) stage=$2; shift 2;;
    --stop_stage) stop_stage=$2; shift 2;;
    *) echo "unknown option $1"; exit 1;;
  esac
done

train_set=data/train_nodev

if [ $stage -le 0 ] && [ $stop_stage -ge 0 ]; then
  echo "=== stage 0: target text (lowercase copy, reference st1 convention)"
  [ -f $train_set/text ] || { echo "run ./run.sh first (data prep)"; exit 1; }
  awk '{printf "%s", $1; for (i=2; i<=NF; i++) printf " %s", tolower($i); print ""}' \
    $train_set/text > $train_set/text.lc
  # target token list (lowercase chars)
  python -m espnet_tpu.bin.tokenize_text \
    -i $train_set/text.lc -o data/tokens_lc.txt -f 2- -t char \
    --write_vocabulary true \
    --add_symbol '<blank>:0' --add_symbol '<unk>:1' --add_symbol '<sos/eos>:-1'
fi

if [ $stage -le 1 ] && [ $stop_stage -ge 1 ]; then
  echo "=== stage 1: ST training (aux ASR CTC/attention losses)"
  python -m espnet_tpu.bin.st_train \
    --train_data $train_set/wav.scp,speech,sound \
    --train_data $train_set/text.lc,text,text \
    --train_data $train_set/text,src_text,text \
    --valid_data $train_set/wav.scp,speech,sound \
    --valid_data $train_set/text.lc,text,text \
    --valid_data $train_set/text,src_text,text \
    --token_list data/tokens_lc.txt --src_token_list data/tokens.txt \
    --expdir exp/st --max_epoch 600 --batch_size 4 \
    --frontend_conf '{"fs": 16000, "n_fft": 512, "hop_length": 160, "n_mels": 80}' \
    --encoder_conf '{"attention_dim": 64, "attention_heads": 4, "linear_units": 128, "num_blocks": 2}' \
    --decoder_conf '{"attention_dim": 64, "attention_heads": 4, "linear_units": 128, "num_blocks": 1}' \
    --optim_conf '{"lr": 0.001}'
fi

if [ $stage -le 2 ] && [ $stop_stage -ge 2 ]; then
  echo "=== stage 2: translate + BLEU"
  python -m espnet_tpu.bin.st_trans \
    --data $train_set/wav.scp,speech,sound \
    --text $train_set/text.lc \
    --config exp/st/config.yaml --ckpt exp/st/latest.ckpt \
    --output_dir exp/st/trans_train_nodev --beam_size 5 --batch_size 3
fi

if [ $stage -le 3 ] && [ $stop_stage -ge 3 ]; then
  echo "=== stage 3: summary"
  cat exp/st/trans_train_nodev/summary.json
  echo
fi
