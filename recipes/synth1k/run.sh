#!/usr/bin/env bash
# synth1k — the learning-evidence recipe (VERDICT r2 #2): a 1.5k-utt
# formant-synthesized spelled-word corpus with HELD-OUT speakers, big
# enough to show reference-shaped accuracy behavior (falling held-out
# WER, LM-fusion/beam/ctc_weight ablations moving WER the way
# egs/an4/asr1/RESULTS documents).
#
#   ./run.sh [--stage N] [--stop_stage M] [--arch conformer|transformer|transducer]
#
# Stages: 0 data gen | 1 stats | 2 LM | 3 train | 4 decode+score
#         5 decode ablations | 6 learning curve (375/750/1500)
set -euo pipefail
cd "$(dirname "$0")"
export PYTHONPATH="$(cd ../..; pwd):${PYTHONPATH:-}"

stage=0
stop_stage=6
arch=conformer
expdir=exp
datadir=data
while [ $# -gt 0 ]; do
  case "$1" in
    --stage) stage=$2; shift 2;;
    --stop_stage) stop_stage=$2; shift 2;;
    --arch) arch=$2; shift 2;;
    *) echo "unknown option $1"; exit 1;;
  esac
done

train_set=$datadir/train
dev_set=$datadir/dev
test_set=$datadir/test
tokens=$datadir/tokens.txt
conf=conf/train_${arch}.yaml
asrdir=$expdir/asr_${arch}

decode_opts_common="--batch_size 16"

if [ $stage -le 0 ] && [ $stop_stage -ge 0 ]; then
  echo "=== stage 0: data generation (1500/150/150, held-out speakers)"
  python local/make_corpus.py --out $datadir
  for s in train dev test; do
    python -m espnet_tpu.bin.data_utils fix $datadir/$s
    python -m espnet_tpu.bin.data_utils validate $datadir/$s
  done
fi

if [ $stage -le 1 ] && [ $stop_stage -ge 1 ]; then
  echo "=== stage 1: collect stats"
  python -m espnet_tpu.bin.asr_train \
    --collect_stats true \
    --train_data $train_set/wav.scp,speech,sound \
    --train_data $train_set/text,text,text \
    --token_list $tokens --expdir $asrdir --stats_dir $expdir/stats \
    --config $conf
fi

if [ $stage -le 2 ] && [ $stop_stage -ge 2 ]; then
  echo "=== stage 2: char LM training + test perplexity"
  python -m espnet_tpu.bin.lm_train \
    --train_data $train_set/text,text,text \
    --valid_data $dev_set/text,text,text \
    --token_list $tokens --expdir $expdir/lm --config conf/lm_rnn.yaml
  # text-only eval: host CPU (don't hold the accelerator for this)
  JAX_PLATFORMS=cpu python -m espnet_tpu.bin.lm_calc_perplexity \
    --data $test_set/text,text,text \
    --config $expdir/lm/config.yaml \
    --ckpt $expdir/lm/valid.loss.best.ckpt \
    --output_dir $expdir/lm/ppl_test
fi

if [ $stage -le 3 ] && [ $stop_stage -ge 3 ]; then
  echo "=== stage 3: ASR training ($arch)"
  python -m espnet_tpu.bin.asr_train \
    --train_data $train_set/wav.scp,speech,sound \
    --train_data $train_set/text,text,text \
    --valid_data $dev_set/wav.scp,speech,sound \
    --valid_data $dev_set/text,text,text \
    --token_list $tokens --expdir $asrdir --stats_dir $expdir/stats \
    --config $conf
  # average the kept n-best epoch checkpoints (GC keeps keep_nbest=5)
  kept=$(ls $asrdir/[0-9]*epoch.ckpt 2>/dev/null | head -5)
  [ -n "$kept" ] && python -m espnet_tpu.bin.average_checkpoints \
    --ckpts $kept --out $asrdir/avg5.ckpt || true
fi

decode () {  # decode <ckpt> <outdir> <extra args...>
  local ckpt=$1 outdir=$2; shift 2
  python -m espnet_tpu.bin.asr_recog \
    --data $test_set/wav.scp,speech,sound --text $test_set/text \
    --config $asrdir/config.yaml --ckpt $ckpt \
    --output_dir $outdir $decode_opts_common "$@"
  python - <<PY
import json; s = json.load(open("$outdir/summary.json")); print("$outdir:", s)
PY
}

best_ckpt () {
  if [ -f $asrdir/avg5.ckpt ]; then echo $asrdir/avg5.ckpt; \
  else echo $asrdir/valid.loss.best.ckpt; fi
}

if [ $stage -le 4 ] && [ $stop_stage -ge 4 ]; then
  echo "=== stage 4: decode + score (primary: beam 10, ctc 0.3, LM 0.3)"
  if [ "$arch" = transducer ]; then
    decode "$(best_ckpt)" $asrdir/decode_test \
      --transducer_search alsd_batch --beam_size 5
  else
    decode "$(best_ckpt)" $asrdir/decode_test \
      --beam_size 10 --ctc_weight 0.3 \
      --lm_config $expdir/lm/config.yaml \
      --lm_ckpt $expdir/lm/valid.loss.best.ckpt --lm_weight 0.3
  fi
fi

if [ $stage -le 5 ] && [ $stop_stage -ge 5 ] && [ "$arch" != transducer ]; then
  echo "=== stage 5: decode ablations (beam / ctc_weight / LM fusion)"
  ck=$(best_ckpt)
  lm="--lm_config $expdir/lm/config.yaml --lm_ckpt $expdir/lm/valid.loss.best.ckpt"
  decode $ck $asrdir/ablate_beam1  --beam_size 1  --ctc_weight 0.3
  decode $ck $asrdir/ablate_beam5  --beam_size 5  --ctc_weight 0.3
  decode $ck $asrdir/ablate_beam10 --beam_size 10 --ctc_weight 0.3
  decode $ck $asrdir/ablate_ctc0   --beam_size 10 --ctc_weight 0.0
  decode $ck $asrdir/ablate_ctc06  --beam_size 10 --ctc_weight 0.6
  decode $ck $asrdir/ablate_lm03   --beam_size 10 --ctc_weight 0.3 $lm --lm_weight 0.3
fi

if [ $stage -le 6 ] && [ $stop_stage -ge 6 ]; then
  echo "=== stage 6: learning curve (train-size 375 / 750 / full 1500)"
  # isolate DATA AMOUNT, not schedule artifacts: the full-corpus config
  # warms up over 600 steps (~13 epochs at 47 steps/epoch); a 375-utt
  # subset has only 12 steps/epoch, so the same yaml would spend nearly
  # the whole run inside warmup. Scale warmup_steps by the subset
  # fraction and double max_epoch so the post-warmup step budget is
  # comparable (standard data-ablation practice).
  # subsets must be SPEAKER-STRATIFIED: a --first N cut of the
  # uid-sorted manifest keeps only the first ~N/62 speakers (375 -> 6 of
  # 24) and the held-out-speaker WER then measures speaker-coverage
  # collapse, not data amount (measured: 97% WER at n=375 --first vs
  # the stratified result in RESULTS.md). Round-robin across speakers.
  for n in 375 750; do
    sub=$datadir/train_$n
    if [ ! -f $datadir/subset_$n.list ]; then
      python - "$train_set/utt2spk" "$datadir/subset_$n.list" "$n" <<'PY'
import sys
from collections import defaultdict
u2s, out, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
spk = defaultdict(list)
for ln in open(u2s):
    u, s = ln.split()
    spk[s].append(u)
order, i = [], 0
while len(order) < n:
    for s in sorted(spk):
        if i < len(spk[s]) and len(order) < n:
            order.append(spk[s][i])
    i += 1
open(out, "w").write("\n".join(sorted(order)) + "\n")
PY
    fi
    rm -rf $sub
    python -m espnet_tpu.bin.data_utils subset \
      $train_set $sub --utt_list $datadir/subset_$n.list
    subexp=$expdir/asr_${arch}_n$n
    subconf=$expdir/train_${arch}_n$n.yaml
    python - "$conf" "$subconf" "$n" <<'PY'
import sys, yaml
conf, out, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
d = yaml.safe_load(open(conf))
frac = n / 1500.0
sch = d.setdefault("scheduler_conf", {})
sch["warmup_steps"] = max(int(sch.get("warmup_steps", 600) * frac), 50)
d["max_epoch"] = int(d.get("max_epoch", 60) * 2)
# small subsets overfit: valid LOSS keeps rising after a few epochs, so
# loss-best picks a barely-trained model whose free-running decode
# degenerates (measured: epoch-120 ckpt decodes train at 0% WER, the
# loss-best one at 98%). The reference decodes model.acc.best for
# attention models (egs/*/asr1/run.sh recog_model) — do the same here.
d["best_key"] = "acc"
yaml.safe_dump(d, open(out, "w"))
PY
    python -m espnet_tpu.bin.asr_train \
      --train_data $sub/wav.scp,speech,sound \
      --train_data $sub/text,text,text \
      --valid_data $dev_set/wav.scp,speech,sound \
      --valid_data $dev_set/text,text,text \
      --token_list $tokens --expdir $subexp --stats_dir $expdir/stats \
      --config $subconf
    python -m espnet_tpu.bin.asr_recog \
      --data $test_set/wav.scp,speech,sound --text $test_set/text \
      --config $subexp/config.yaml --ckpt $subexp/valid.acc.best.ckpt \
      --output_dir $subexp/decode_test $decode_opts_common \
      --beam_size 10 --ctc_weight 0.3
    cat $subexp/decode_test/summary.json; echo
  done
fi

echo "=== synth1k done"
