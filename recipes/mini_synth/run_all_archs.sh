#!/usr/bin/env bash
# Cross-architecture WER matrix on the mini_synth corpus: trains and
# decodes every ASR model family end-to-end through the real CLIs
# (analog of the reference's ci/test_integration.sh sweep over
# rnn/transformer/conformer/transducer/maskctc configs).
# Assumes ./run.sh --stop_stage 1 has produced data/ and exp/stats.
set -euo pipefail
cd "$(dirname "$0")"
export PYTHONPATH="$(cd ../..; pwd):${PYTHONPATH:-}"

datadir=data
train_set=$datadir/train
dev_set=$datadir/dev
test_set=$datadir/test
tokens=$datadir/tokens.txt

train_decode () {  # name config tokens extra_decode_args...
  local name=$1 config=$2 toks=$3; shift 3
  echo "=== $name: train"
  python -m espnet_tpu.bin.asr_train \
    --train_data $train_set/wav.scp,speech,sound \
    --train_data $train_set/text,text,text \
    --valid_data $dev_set/wav.scp,speech,sound \
    --valid_data $dev_set/text,text,text \
    --token_list $toks --expdir exp/$name --stats_dir exp/stats \
    --config $config
  echo "=== $name: decode"
  python -m espnet_tpu.bin.asr_recog \
    --data $test_set/wav.scp,speech,sound --text $test_set/text \
    --config exp/$name/config.yaml --ckpt exp/$name/valid.loss.best.ckpt \
    --output_dir exp/$name/decode_test --batch_size 5 "$@"
}

train_decode transformer conf/train_transformer.yaml $tokens \
  --beam_size 5 --ctc_weight 0.5
train_decode conformer conf/train_conformer.yaml $tokens \
  --beam_size 5 --ctc_weight 0.5
train_decode transducer conf/train_transducer.yaml $tokens \
  --transducer_search alsd_batch --beam_size 5

# maskctc needs <mask> appended as the LAST token (mask = vocab-1)
cp $tokens $datadir/tokens_mask.txt
echo '<mask>' >> $datadir/tokens_mask.txt
train_decode maskctc conf/train_maskctc.yaml $datadir/tokens_mask.txt \
  --maskctc_threshold 0.99 --maskctc_iterations 3

echo "=== summary"
for name in rnn transformer conformer transducer maskctc; do
  d=exp/$name/decode_test/summary.json
  [ -f "$d" ] || d=exp/asr/decode_test/summary.json  # rnn lives in exp/asr
  [ "$name" = rnn ] && d=exp/asr/decode_test/summary.json
  [ -f "$d" ] && echo "$name: $(cat $d)"
done
