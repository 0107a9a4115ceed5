#!/usr/bin/env bash
# Corpus-agnostic staged ASR driver — the analog of the reference's
# egs2/TEMPLATE/asr1/asr.sh (1343 lines, 15 stages), collapsed onto the
# espnet_tpu CLI surface. A corpus recipe provides `local/data.sh`
# producing Kaldi-style data dirs (wav.scp + text per set), then calls:
#
#   ../TEMPLATE/asr.sh --train_set data/train --valid_set data/dev \
#     --test_sets "data/test" --asr_config conf/train.yaml \
#     [--lm_config conf/lm.yaml] [--token_type char|bpe] [--nbpe 100] \
#     [--speed_perturb_factors "0.9 1.0 1.1"] [--stage N] [--stop_stage M]
#
# Stages (↔ egs2 asr.sh):
#   1 data prep (local/data.sh hook)          (↔ stage 1)
#   2 speed perturbation                      (↔ stage 2)
#   3 token list (char or own-BPE)            (↔ stage 5)
#   4 LM train + perplexity                   (↔ stages 6-8)
#   5 ASR collect-stats                       (↔ stage 10)
#   6 ASR train                               (↔ stage 11)
#   7 decode + scoring (sclite-style reports) (↔ stages 12-13)
#   8 pack model                              (↔ stage 15)
set -euo pipefail
export PYTHONPATH="$(cd "$(dirname "$0")/../.."; pwd):${PYTHONPATH:-}"

stage=1
stop_stage=8
train_set=data/train
valid_set=data/dev
test_sets="data/test"
asr_config=conf/train.yaml
lm_config=""
token_type=char
nbpe=100
tokens=data/tokens.txt
expdir=exp
lm_weight=0.3
beam_size=10
ctc_weight=0.3
decode_args=""
decode_ckpt=""          # default: averaged n-best if present, else valid-best
nj=1                    # decode shards (reference asr.sh:1105 job arrays)
cmd_backend=local       # run.pl-family cmd layer (doc/parallelization.md):
                        # local | slurm — array jobs go through
                        # espnet_tpu.bin.cmd_run with per-job logs
speed_perturb_factors=""
python=python
bpemodel=""

while [ $# -gt 0 ]; do
  case "$1" in
    --stage) stage=$2; shift 2;;
    --stop_stage) stop_stage=$2; shift 2;;
    --train_set) train_set=$2; shift 2;;
    --valid_set) valid_set=$2; shift 2;;
    --test_sets) test_sets=$2; shift 2;;
    --asr_config) asr_config=$2; shift 2;;
    --lm_config) lm_config=$2; shift 2;;
    --token_type) token_type=$2; shift 2;;
    --nbpe) nbpe=$2; shift 2;;
    --tokens) tokens=$2; shift 2;;
    --expdir) expdir=$2; shift 2;;
    --lm_weight) lm_weight=$2; shift 2;;
    --beam_size) beam_size=$2; shift 2;;
    --ctc_weight) ctc_weight=$2; shift 2;;
    --decode_args) decode_args=$2; shift 2;;
    --decode_ckpt) decode_ckpt=$2; shift 2;;
    --nj) nj=$2; shift 2;;
    --cmd_backend) cmd_backend=$2; shift 2;;
    --speed_perturb_factors) speed_perturb_factors=$2; shift 2;;
    *) echo "unknown option $1"; exit 1;;
  esac
done
[ -n "$bpemodel" ] || bpemodel=$(dirname $tokens)/bpe.model
tok_args="--token_type $token_type"
if [ "$token_type" = bpe ]; then
  tok_args="$tok_args --bpemodel $bpemodel"
fi

log() { echo "=== $(date +%T) $*"; }

if [ $stage -le 1 ] && [ $stop_stage -ge 1 ]; then
  log "stage 1: data preparation (local/data.sh)"
  if [ -x local/data.sh ]; then
    ./local/data.sh
  else
    echo "no local/data.sh — assuming data dirs already exist"
  fi
  for d in $train_set $valid_set $test_sets; do
    [ -f "$d/wav.scp" ] || { echo "missing $d/wav.scp"; exit 1; }
    [ -f "$d/text" ] || { echo "missing $d/text"; exit 1; }
  done
fi

if [ $stage -le 2 ] && [ $stop_stage -ge 2 ] && [ -n "$speed_perturb_factors" ]; then
  log "stage 2: speed perturbation ($speed_perturb_factors)"
  $python - "$train_set" $speed_perturb_factors <<'PYEOF'
import sys
from pathlib import Path
import numpy as np
from espnet_tpu.data.kaldi_io import read_scp, write_scp
from espnet_tpu.data.wav import read_wav, write_wav

src = Path(sys.argv[1])
factors = [float(f) for f in sys.argv[2:]]
dst = Path(str(src) + "_sp")
(dst).mkdir(parents=True, exist_ok=True)
wavdir = dst / "wavs"
wavdir.mkdir(exist_ok=True)
scp = read_scp(src / "wav.scp")
texts = dict(
    line.split(" ", 1)
    for line in (src / "text").read_text().splitlines()
    if " " in line
)
out_scp, out_text = {}, {}
for uid, path in scp.items():
    if uid not in texts:
        print(f"skip {uid}: no transcript")
        continue
    fs, w = read_wav(path)
    for f in factors:
        suf = f"sp{f:g}-{uid}"
        if abs(f - 1.0) < 1e-9:
            out_scp[suf] = path
        else:
            # resample by 1/f (sox speed analog: same rate, new duration)
            n = int(round(len(w) / f))
            idx = np.linspace(0, len(w) - 1, n)
            w2 = np.interp(idx, np.arange(len(w)), w).astype(np.float32)
            p2 = wavdir / f"{suf}.wav"
            write_wav(p2, fs, w2)
            out_scp[suf] = str(p2)
        out_text[suf] = texts[uid]
write_scp(dst / "wav.scp", out_scp)
with open(dst / "text", "w") as fh:
    for k, v in out_text.items():
        fh.write(f"{k} {v}\n")
print(f"speed-perturbed {len(scp)} -> {len(out_scp)} utts at {dst}")
PYEOF
fi
# speed-perturbed copy becomes the train set whether stage 2 just ran or
# we are resuming at a later stage (the [ $stage -le 2 ] guard must not
# silently fall back to unperturbed data)
if [ -n "$speed_perturb_factors" ] && [ -d "${train_set}_sp" ]; then
  train_set=${train_set}_sp
fi

if [ $stage -le 3 ] && [ $stop_stage -ge 3 ]; then
  log "stage 3: token list ($token_type)"
  extra=""
  if [ "$token_type" = bpe ]; then
    extra="--train_bpe true --bpe_vocab_size $nbpe --bpemodel $bpemodel"
  fi
  cat $train_set/text $valid_set/text | \
    $python -m espnet_tpu.bin.tokenize_text \
      -i - -o $tokens -f 2- -t $token_type --write_vocabulary true \
      --add_symbol '<blank>:0' --add_symbol '<unk>:1' \
      --add_symbol '<sos/eos>:-1' $extra
  echo "vocab: $(wc -l < $tokens)"
fi

if [ $stage -le 4 ] && [ $stop_stage -ge 4 ] && [ -n "$lm_config" ]; then
  log "stage 4: LM training + perplexity"
  $python -m espnet_tpu.bin.lm_train \
    --train_data $train_set/text,text,text \
    --valid_data $valid_set/text,text,text \
    --token_list $tokens --expdir $expdir/lm --config $lm_config $tok_args
  for tset in $test_sets; do
    $python -m espnet_tpu.bin.lm_calc_perplexity \
      --data $tset/text,text,text \
      --config $expdir/lm/config.yaml \
      --ckpt $expdir/lm/valid.loss.best.ckpt \
      --output_dir $expdir/lm/ppl_$(basename $tset)
  done
fi

if [ $stage -le 5 ] && [ $stop_stage -ge 5 ]; then
  log "stage 5: ASR collect-stats"
  $python -m espnet_tpu.bin.asr_train \
    --collect_stats true \
    --train_data $train_set/wav.scp,speech,sound \
    --train_data $train_set/text,text,text \
    --token_list $tokens --expdir $expdir/asr --stats_dir $expdir/stats \
    --config $asr_config $tok_args
fi

if [ $stage -le 6 ] && [ $stop_stage -ge 6 ]; then
  log "stage 6: ASR training"
  $python -m espnet_tpu.bin.asr_train \
    --train_data $train_set/wav.scp,speech,sound \
    --train_data $train_set/text,text,text \
    --valid_data $valid_set/wav.scp,speech,sound \
    --valid_data $valid_set/text,text,text \
    --token_list $tokens --expdir $expdir/asr --stats_dir $expdir/stats \
    --config $asr_config $tok_args
fi

if [ $stage -le 7 ] && [ $stop_stage -ge 7 ]; then
  log "stage 7: decode + scoring"
  # decode the averaged n-best model when the trainer wrote one
  # (reference run.sh decodes avg snapshots for transformer models)
  if [ -z "$decode_ckpt" ]; then
    decode_ckpt=$(ls -1 $expdir/asr/avg_*best.ckpt 2>/dev/null | head -1)
    [ -n "$decode_ckpt" ] || decode_ckpt=$expdir/asr/valid.loss.best.ckpt
  fi
  echo "decoding with $decode_ckpt"
  lm_args=""
  if [ -n "$lm_config" ] && [ -f $expdir/lm/valid.loss.best.ckpt ]; then
    lm_args="--lm_config $expdir/lm/config.yaml --lm_ckpt $expdir/lm/valid.loss.best.ckpt --lm_weight $lm_weight"
  fi
  for tset in $test_sets; do
    name=$(basename $tset)
    ddir=$expdir/asr/decode_$name
    if [ "$nj" -gt 1 ]; then
      # job-array parallel decode (reference egs2/TEMPLATE/asr1/asr.sh:1105):
      # shard the scp, decode shards concurrently, merge, score once
      sdir=$ddir/split
      $python -m espnet_tpu.bin.split_scps \
        --scps $tset/wav.scp $tset/text --num_splits $nj --output_dir $sdir
      # array job through the run.pl-equivalent cmd layer: JOB is
      # substituted per shard, each shard gets $ddir/log/decode.JOB.log
      $python -m espnet_tpu.bin.cmd_run --backend $cmd_backend \
        JOB=1:$nj $ddir/log/decode.JOB.log \
        $python -m espnet_tpu.bin.asr_recog \
          --data $sdir/split$nj/JOB/wav.scp,speech,sound \
          --config $expdir/asr/config.yaml \
          --ckpt $decode_ckpt \
          --output_dir $ddir/output.JOB \
          --beam_size $beam_size --ctc_weight $ctc_weight --batch_size 8 \
          $lm_args $decode_args \
        || { echo "a decode shard failed (see $ddir/log/)"; exit 1; }
      mkdir -p $ddir
      cat $ddir/output.*/text | sort > $ddir/text
      $python -m espnet_tpu.bin.score_text \
        --ref $tset/text --hyp $ddir/text --output_dir $ddir
    else
      $python -m espnet_tpu.bin.asr_recog \
        --data $tset/wav.scp,speech,sound --text $tset/text \
        --config $expdir/asr/config.yaml \
        --ckpt $decode_ckpt \
        --output_dir $ddir \
        --beam_size $beam_size --ctc_weight $ctc_weight --batch_size 8 \
        $lm_args $decode_args
    fi
    echo "--- $name: $(cat $ddir/summary.json)"
  done
fi

if [ $stage -le 8 ] && [ $stop_stage -ge 8 ]; then
  log "stage 8: pack model"
  pack_files="$expdir/asr/config.yaml $expdir/asr/valid.loss.best.ckpt $tokens"
  # normalization stats live next to config.yaml and are REQUIRED for
  # decode-quality parity (build_model_from_file loads them from the
  # config's directory)
  [ -f $expdir/asr/feats_stats.npz ] && pack_files="$pack_files $expdir/asr/feats_stats.npz"
  $python -m espnet_tpu.bin.pack pack \
    --files $pack_files \
    --out $expdir/asr/model.zip || echo "pack skipped"
  log "done"
fi
