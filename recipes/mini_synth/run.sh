#!/usr/bin/env bash
# mini_synth ASR recipe — Kaldi-style numbered stages driving the
# espnet_tpu CLIs end to end (the analog of egs/mini_an4/asr1/run.sh).
#
#   ./run.sh [--stage N] [--stop_stage M]
#
# Stages: 0 data gen | 1 collect-stats | 2 LM train | 3 ASR train
#         4 decode+score | 5 align
set -euo pipefail
cd "$(dirname "$0")"
export PYTHONPATH="$(cd ../..; pwd):${PYTHONPATH:-}"

stage=0
stop_stage=5
expdir=exp
datadir=data
while [ $# -gt 0 ]; do
  case "$1" in
    --stage) stage=$2; shift 2;;
    --stop_stage) stop_stage=$2; shift 2;;
    *) echo "unknown option $1"; exit 1;;
  esac
done

train_set=$datadir/train
dev_set=$datadir/dev
test_set=$datadir/test
tokens=$datadir/tokens.txt

if [ $stage -le 0 ] && [ $stop_stage -ge 0 ]; then
  echo "=== stage 0: data generation"
  python local/make_data.py --out $datadir
fi

if [ $stage -le 1 ] && [ $stop_stage -ge 1 ]; then
  echo "=== stage 1: collect stats"
  python -m espnet_tpu.bin.asr_train \
    --collect_stats true \
    --train_data $train_set/wav.scp,speech,sound \
    --train_data $train_set/text,text,text \
    --token_list $tokens --expdir $expdir/asr --stats_dir $expdir/stats \
    --config conf/train_rnn.yaml
fi

if [ $stage -le 2 ] && [ $stop_stage -ge 2 ]; then
  echo "=== stage 2: LM training"
  python -m espnet_tpu.bin.lm_train \
    --train_data $train_set/text,text,text \
    --valid_data $dev_set/text,text,text \
    --token_list $tokens --expdir $expdir/lm --config conf/lm_rnn.yaml
  python -m espnet_tpu.bin.lm_calc_perplexity \
    --data $test_set/text,text,text \
    --config $expdir/lm/config.yaml \
    --ckpt $expdir/lm/valid.loss.best.ckpt \
    --output_dir $expdir/lm/ppl_test
fi

if [ $stage -le 3 ] && [ $stop_stage -ge 3 ]; then
  echo "=== stage 3: ASR training"
  python -m espnet_tpu.bin.asr_train \
    --train_data $train_set/wav.scp,speech,sound \
    --train_data $train_set/text,text,text \
    --valid_data $dev_set/wav.scp,speech,sound \
    --valid_data $dev_set/text,text,text \
    --token_list $tokens --expdir $expdir/asr --stats_dir $expdir/stats \
    --config conf/train_rnn.yaml
fi

if [ $stage -le 4 ] && [ $stop_stage -ge 4 ]; then
  echo "=== stage 4: decoding + scoring (with LM fusion)"
  python -m espnet_tpu.bin.asr_recog \
    --data $test_set/wav.scp,speech,sound --text $test_set/text \
    --config $expdir/asr/config.yaml \
    --ckpt $expdir/asr/valid.loss.best.ckpt \
    --output_dir $expdir/asr/decode_test \
    --beam_size 5 --ctc_weight 0.5 --batch_size 5 \
    --lm_config $expdir/lm/config.yaml \
    --lm_ckpt $expdir/lm/valid.loss.best.ckpt --lm_weight 0.3
  cat $expdir/asr/decode_test/summary.json; echo
fi

if [ $stage -le 5 ] && [ $stop_stage -ge 5 ]; then
  echo "=== stage 5: CTC forced alignment"
  python -m espnet_tpu.bin.asr_align \
    --data $test_set/wav.scp,speech,sound --text $test_set/text \
    --config $expdir/asr/config.yaml \
    --ckpt $expdir/asr/valid.loss.best.ckpt \
    --output $expdir/asr/align_test.txt
  head -5 $expdir/asr/align_test.txt
fi

echo "=== recipe done"
