#!/usr/bin/env bash
# Learning-curve midpoints (VERDICT r4 next-round #8): train N=1000 and
# N=1250 speaker-stratified subsets with the same schedule scaling as
# run.sh stage 6 (warmup ∝ subset fraction, 2× max_epoch, acc-best
# checkpoint selection) to localize the sharp 750→1500 generalization
# transition measured in RESULTS.md.
#
#   ./run_curve_mid.sh [--ns "1000 1250"] [--arch conformer]
set -euo pipefail
cd "$(dirname "$0")"
export PYTHONPATH="$(cd ../..; pwd):${PYTHONPATH:-}"

ns="1000 1250"
arch=conformer
expdir=exp
datadir=data
conf=""          # override base config (e.g. the CPU-stable schedule)
tag=""           # suffix for exp dirs (e.g. _stable)
while [ $# -gt 0 ]; do
  case "$1" in
    --ns) ns=$2; shift 2;;
    --arch) arch=$2; shift 2;;
    --conf) conf=$2; shift 2;;
    --tag) tag=$2; shift 2;;
    *) echo "unknown option $1"; exit 1;;
  esac
done

train_set=$datadir/train
dev_set=$datadir/dev
test_set=$datadir/test
tokens=$datadir/tokens.txt
[ -n "$conf" ] || conf=conf/train_${arch}.yaml

# stats must exist (run.sh stage 1)
[ -f $expdir/stats/feats_stats.npz ] || [ -d $expdir/stats ] || {
  echo "run ./run.sh --stage 1 --stop_stage 1 first"; exit 1; }

for n in $ns; do
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
  subexp=$expdir/asr_${arch}_n${n}${tag}
  subconf=$expdir/train_${arch}_n${n}${tag}.yaml
  python - "$conf" "$subconf" "$n" <<'PY'
import sys, yaml
conf, out, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
d = yaml.safe_load(open(conf))
frac = n / 1500.0
sch = d.setdefault("scheduler_conf", {})
sch["warmup_steps"] = max(int(sch.get("warmup_steps", 600) * frac), 50)
d["max_epoch"] = int(d.get("max_epoch", 60) * 2)
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
    --output_dir $subexp/decode_test --batch_size 16 \
    --beam_size 10 --ctc_weight 0.3
  cat $subexp/decode_test/summary.json; echo
done
echo "=== curve midpoints done"
