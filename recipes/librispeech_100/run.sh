#!/usr/bin/env bash
# Librispeech-100h Conformer recipe.
#
# Expects Kaldi-style data dirs prepared externally (this environment
# has no network access to download Librispeech):
#   data/{train_clean_100,dev_clean,test_clean}/{wav.scp,text}
#
# Stages: 0 bpe + token list | 1 collect-stats | 2 LM | 3 ASR train
#         4 decode+score
set -euo pipefail
cd "$(dirname "$0")"
export PYTHONPATH="$(cd ../..; pwd):${PYTHONPATH:-}"

stage=0
stop_stage=4
train_set=data/train_clean_100
dev_set=data/dev_clean
test_set=data/test_clean
expdir=exp
nbpe=5000
config=conf/train_conformer.yaml

while [ $# -gt 0 ]; do
  case "$1" in
    --stage) stage=$2; shift 2;;
    --stop_stage) stop_stage=$2; shift 2;;
    --config) config=$2; shift 2;;
    *) echo "unknown option $1"; exit 1;;
  esac
done

if [ $stage -le 0 ] && [ $stop_stage -ge 0 ]; then
  echo "=== stage 0: BPE model + token list"
  python - <<EOF
from pathlib import Path
from espnet_tpu.text.bpe import BPETokenizer

texts = [l.split(" ", 1)[1] for l in Path("$train_set/text").read_text().splitlines() if " " in l]
bpe = BPETokenizer.train(texts, vocab_size=$nbpe)
Path("data").mkdir(exist_ok=True)
bpe.save("data/bpe.json")
vocab = set()
for t in texts:
    vocab.update(bpe.text2tokens(t))
tokens = ["<blank>", "<unk>"] + sorted(vocab) + ["<sos/eos>"]
Path("data/tokens.txt").write_text("\n".join(tokens))
print(f"BPE vocab {len(tokens)}")
EOF
fi

common_args=(
  --token_list data/tokens.txt
  --config "$config"
  --token_type bpe --bpemodel data/bpe.json
)

if [ $stage -le 1 ] && [ $stop_stage -ge 1 ]; then
  echo "=== stage 1: collect stats"
  python -m espnet_tpu.bin.asr_train \
    --collect_stats true \
    --train_data $train_set/wav.scp,speech,sound \
    --train_data $train_set/text,text,text \
    --expdir $expdir/asr --stats_dir $expdir/stats "${common_args[@]}"
fi

if [ $stage -le 2 ] && [ $stop_stage -ge 2 ]; then
  echo "=== stage 2: LM training"
  python -m espnet_tpu.bin.lm_train \
    --train_data $train_set/text,text,text \
    --valid_data $dev_set/text,text,text \
    --token_list data/tokens.txt --expdir $expdir/lm \
    --lm transformer \
    --lm_conf.attention_dim 512 --lm_conf.num_blocks 16 \
    --lm_conf.linear_units 2048 --lm_conf.attention_heads 8 \
    --token_type bpe --bpemodel data/bpe.json \
    --optim_conf.lr 0.0001 --max_epoch 25
fi

if [ $stage -le 3 ] && [ $stop_stage -ge 3 ]; then
  echo "=== stage 3: ASR training"
  python -m espnet_tpu.bin.asr_train \
    --train_data $train_set/wav.scp,speech,sound \
    --train_data $train_set/text,text,text \
    --valid_data $dev_set/wav.scp,speech,sound \
    --valid_data $dev_set/text,text,text \
    --expdir $expdir/asr --stats_dir $expdir/stats "${common_args[@]}"
fi

if [ $stage -le 4 ] && [ $stop_stage -ge 4 ]; then
  echo "=== stage 4: decode + score"
  python -m espnet_tpu.bin.asr_recog \
    --data $test_set/wav.scp,speech,sound --text $test_set/text \
    --config $expdir/asr/config.yaml \
    --ckpt $expdir/asr/avg_10best.ckpt \
    --output_dir $expdir/asr/decode_test_clean \
    --beam_size 60 --ctc_weight 0.4 --batch_size 8 \
    --lm_config $expdir/lm/config.yaml \
    --lm_ckpt $expdir/lm/valid.loss.best.ckpt --lm_weight 0.6
  cat $expdir/asr/decode_test_clean/summary.json; echo
fi
