#!/usr/bin/env bash
# mini_an4 ASR recipe on REAL AN4 speech (the reference's offline corpus,
# egs/mini_an4/asr1/downloads.tar.gz) — the analog of
# egs/mini_an4/asr1/run.sh: data prep → char dict → LM → hybrid
# CTC/attention training → beam decode with LM fusion → WER report.
#
#   ./run.sh [--stage N] [--stop_stage M] [--tarball PATH]
set -euo pipefail
cd "$(dirname "$0")"
export PYTHONPATH="$(cd ../..; pwd):${PYTHONPATH:-}"

stage=0
stop_stage=5
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

train_set=$datadir/train_nodev
dev_set=$datadir/train_dev
test_set=$datadir/test
tokens=$datadir/tokens.txt

if [ $stage -le 0 ] && [ $stop_stage -ge 0 ]; then
  echo "=== stage 0: data preparation (untar AN4, build data dirs)"
  python local/data_prep.py --tarball "$tarball" --workdir .
fi

if [ $stage -le 1 ] && [ $stop_stage -ge 1 ]; then
  echo "=== stage 1: token list (char)"
  cat $train_set/text $dev_set/text | \
    python -m espnet_tpu.bin.tokenize_text \
      -i - -o $tokens -f 2- -t char --write_vocabulary true \
      --add_symbol '<blank>:0' --add_symbol '<unk>:1' --add_symbol '<sos/eos>:-1'
  echo "vocab: $(wc -l < $tokens) tokens"
fi

if [ $stage -le 2 ] && [ $stop_stage -ge 2 ]; then
  echo "=== stage 2: collect stats"
  python -m espnet_tpu.bin.asr_train \
    --collect_stats true \
    --train_data $train_set/wav.scp,speech,sound \
    --train_data $train_set/text,text,text \
    --token_list $tokens --expdir $expdir/asr --stats_dir $expdir/stats \
    --config conf/train_rnn.yaml
fi

if [ $stage -le 3 ] && [ $stop_stage -ge 3 ]; then
  echo "=== stage 3: LM training"
  python -m espnet_tpu.bin.lm_train \
    --train_data $datadir/train/text,text,text \
    --valid_data $dev_set/text,text,text \
    --token_list $tokens --expdir $expdir/lm --config conf/lm_rnn.yaml
fi

if [ $stage -le 4 ] && [ $stop_stage -ge 4 ]; then
  echo "=== stage 4: ASR training"
  python -m espnet_tpu.bin.asr_train \
    --train_data $train_set/wav.scp,speech,sound \
    --train_data $train_set/text,text,text \
    --valid_data $dev_set/wav.scp,speech,sound \
    --valid_data $dev_set/text,text,text \
    --token_list $tokens --expdir $expdir/asr --stats_dir $expdir/stats \
    --config conf/train_rnn.yaml
fi

if [ $stage -le 5 ] && [ $stop_stage -ge 5 ]; then
  echo "=== stage 5: decode + score (beam + LM fusion)"
  # latest.ckpt, not valid-best: with a 2-utterance dev set, valid loss
  # cannot rank checkpoints (it selects a near-untrained epoch); the
  # train_nodev decode demonstrates the acoustic pipeline end to end.
  for rtask in test train_dev train_nodev; do
    python -m espnet_tpu.bin.asr_recog \
      --data $datadir/$rtask/wav.scp,speech,sound --text $datadir/$rtask/text \
      --config $expdir/asr/config.yaml \
      --ckpt $expdir/asr/latest.ckpt \
      --output_dir $expdir/asr/decode_$rtask \
      --beam_size 10 --ctc_weight 0.5 --batch_size 2 \
      --lm_config $expdir/lm/config.yaml \
      --lm_ckpt $expdir/lm/valid.loss.best.ckpt --lm_weight 0.3
  done
  python local/make_results.py --expdir $expdir --out RESULTS.md
  cat RESULTS.md
fi
