#!/usr/bin/env bash
# mini_an4 MT recipe (analog of egs/mini_an4/mt1): text-to-text
# "translation" of the AN4 transcripts into their lowercase copy — the
# reference's own mini_an4 MT convention (st1/run.sh:122).
#
#   ./run_mt.sh [--stage N] [--stop_stage M]
set -euo pipefail
cd "$(dirname "$0")"
export PYTHONPATH="$(cd ../..; pwd):${PYTHONPATH:-}"

stage=0
stop_stage=2
while [ $# -gt 0 ]; do
  case "$1" in
    --stage) stage=$2; shift 2;;
    --stop_stage) stop_stage=$2; shift 2;;
    *) echo "unknown option $1"; exit 1;;
  esac
done

train_set=data/train_nodev

if [ $stage -le 0 ] && [ $stop_stage -ge 0 ]; then
  echo "=== stage 0: source/target text + token lists"
  [ -f $train_set/text ] || { echo "run ./run.sh first (data prep)"; exit 1; }
  awk '{printf "%s", $1; for (i=2; i<=NF; i++) printf " %s", tolower($i); print ""}' \
    $train_set/text > $train_set/text.lc
  python -m espnet_tpu.bin.tokenize_text \
    -i $train_set/text.lc -o data/tokens_lc.txt -f 2- -t char \
    --write_vocabulary true \
    --add_symbol '<blank>:0' --add_symbol '<unk>:1' --add_symbol '<sos/eos>:-1'
fi

if [ $stage -le 1 ] && [ $stop_stage -ge 1 ]; then
  echo "=== stage 1: MT training"
  python -m espnet_tpu.bin.mt_train \
    --train_data $train_set/text,src_text,text \
    --train_data $train_set/text.lc,text,text \
    --valid_data $train_set/text,src_text,text \
    --valid_data $train_set/text.lc,text,text \
    --token_list data/tokens_lc.txt --src_token_list data/tokens.txt \
    --expdir exp/mt --max_epoch 800 --batch_size 4 \
    --encoder_conf '{"attention_dim": 64, "attention_heads": 4, "linear_units": 128, "num_blocks": 2, "input_layer": "embed"}' \
    --decoder_conf '{"attention_dim": 64, "attention_heads": 4, "linear_units": 128, "num_blocks": 1}' \
    --optim_conf '{"lr": 0.001}'
fi

if [ $stage -le 2 ] && [ $stop_stage -ge 2 ]; then
  echo "=== stage 2: translate + BLEU"
  python -m espnet_tpu.bin.mt_trans \
    --data $train_set/text,src_text,text \
    --text $train_set/text.lc \
    --config exp/mt/config.yaml --ckpt exp/mt/latest.ckpt \
    --output_dir exp/mt/trans_train_nodev --beam_size 5 --batch_size 3
  cat exp/mt/trans_train_nodev/summary.json
  echo
fi
