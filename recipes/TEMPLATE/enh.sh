#!/usr/bin/env bash
# Corpus-agnostic staged enhancement/separation driver — the analog of
# the reference's egs2/TEMPLATE/enh1/enh.sh. A corpus recipe provides
# `local/data.sh` producing data dirs with wav_mix.scp + wav_spkN.scp,
# then:
#
#   ../TEMPLATE/enh.sh --train_set data/train --valid_set data/dev \
#     --test_sets "data/test" --enh_config conf/train_enh.yaml \
#     [--n_spk 2] [--fs 8000] [--score_args "--stoi --pesq --bss_eval"]
#
# Stages:
#   1 data prep (local/data.sh hook)
#   2 separator training (chunk iterator, PIT SI-SNR)
#   3 separation (writes per-speaker wavs + scps)
#   4 scoring (SI-SNR/SDR + optional STOI / PESQ / BSS Eval SDR-SIR-SAR)
set -euo pipefail

stage=1
stop_stage=4
train_set=data/train
valid_set=""
test_sets="data/test"
enh_config=conf/train_enh.yaml
n_spk=2
fs=8000
expdir=exp/enh
score_args="--stoi"
python=python

while [ $# -gt 0 ]; do
  case "$1" in
    --stage) stage=$2; shift 2;;
    --stop_stage) stop_stage=$2; shift 2;;
    --train_set) train_set=$2; shift 2;;
    --valid_set) valid_set=$2; shift 2;;
    --test_sets) test_sets=$2; shift 2;;
    --enh_config) enh_config=$2; shift 2;;
    --n_spk) n_spk=$2; shift 2;;
    --fs) fs=$2; shift 2;;
    --expdir) expdir=$2; shift 2;;
    --score_args) score_args=$2; shift 2;;
    *) echo "unknown option $1"; exit 1;;
  esac
done
[ -n "$valid_set" ] || valid_set=$train_set

log() { echo "=== $(date +%T) $*"; }

ref_args() {  # $1 = data dir, $2 = flag name (--train_data etc.)
  local d=$1 flag=$2 out=""
  for i in $(seq 1 $n_spk); do
    out="$out $flag $d/wav_spk$i.scp,speech_ref$i,sound"
  done
  echo "$out"
}

if [ $stage -le 1 ] && [ $stop_stage -ge 1 ]; then
  log "stage 1: data preparation (local/data.sh)"
  if [ -x local/data.sh ]; then ./local/data.sh; fi
  for d in $train_set $valid_set $test_sets; do
    [ -f "$d/wav_mix.scp" ] || { echo "missing $d/wav_mix.scp"; exit 1; }
  done
fi

if [ $stage -le 2 ] && [ $stop_stage -ge 2 ]; then
  log "stage 2: separator training"
  $python -m espnet_tpu.bin.enh_train \
    --train_data $train_set/wav_mix.scp,speech_mix,sound \
    $(ref_args $train_set --train_data) \
    --valid_data $valid_set/wav_mix.scp,speech_mix,sound \
    $(ref_args $valid_set --valid_data) \
    --expdir $expdir --config $enh_config
fi

if [ $stage -le 3 ] && [ $stop_stage -ge 3 ]; then
  log "stage 3: separation"
  for tset in $test_sets; do
    name=$(basename $tset)
    $python -m espnet_tpu.bin.enh_inference \
      --data $tset/wav_mix.scp,speech_mix,sound \
      --config $expdir/config.yaml --ckpt $expdir/latest.ckpt \
      --output_dir $expdir/sep_$name --fs $fs
  done
fi

if [ $stage -le 4 ] && [ $stop_stage -ge 4 ]; then
  log "stage 4: scoring"
  for tset in $test_sets; do
    name=$(basename $tset)
    refs=""
    ests=""
    for i in $(seq 1 $n_spk); do
      refs="$refs $tset/wav_spk$i.scp"
      ests="$ests $expdir/sep_$name/spk$i.scp"
    done
    $python -m espnet_tpu.bin.enh_scoring \
      --ref_scp $refs --est_scp $ests \
      --output_dir $expdir/score_$name $score_args
    echo "--- $name: $(cat $expdir/score_$name/summary.json)"
  done
  log "done"
fi
