#!/usr/bin/env bash
# Corpus-agnostic staged TTS driver — the analog of the reference's
# egs2/TEMPLATE/tts1/tts.sh (1028 lines, 9 stages). A corpus recipe
# provides `local/data.sh` producing data dirs (wav.scp + text), then:
#
#   ../TEMPLATE/tts.sh --train_set data/train --valid_set data/dev \
#     --eval_sets "data/test" --tts_config conf/train_tacotron2.yaml \
#     [--token_type char|phn] [--g2p lexicon:path|en_rule] [--cleaner tacotron]
#
# Stages (↔ egs2 tts.sh):
#   1 data prep (local/data.sh hook)          (↔ stage 1)
#   2 token list (char / phoneme g2p)         (↔ stage 2)
#   3 feats collect-stats                     (↔ stage 5)
#   4 TTS training                            (↔ stage 6)
#   5 synthesis (Griffin-Lim wavs)            (↔ stage 7)
#   6 MCD evaluation vs reference audio       (↔ scoring)
set -euo pipefail

stage=1
stop_stage=6
train_set=data/train
valid_set=""
eval_sets=""
tts_config=conf/train_tacotron2.yaml
token_type=char
g2p=""
cleaner=""
tokens=data/tts_tokens.txt
expdir=exp/tts
stats_dir=""
python=python

while [ $# -gt 0 ]; do
  case "$1" in
    --stage) stage=$2; shift 2;;
    --stop_stage) stop_stage=$2; shift 2;;
    --train_set) train_set=$2; shift 2;;
    --valid_set) valid_set=$2; shift 2;;
    --eval_sets) eval_sets=$2; shift 2;;
    --tts_config) tts_config=$2; shift 2;;
    --token_type) token_type=$2; shift 2;;
    --g2p) g2p=$2; shift 2;;
    --cleaner) cleaner=$2; shift 2;;
    --tokens) tokens=$2; shift 2;;
    --expdir) expdir=$2; shift 2;;
    --stats_dir) stats_dir=$2; shift 2;;
    *) echo "unknown option $1"; exit 1;;
  esac
done
[ -n "$valid_set" ] || valid_set=$train_set
[ -n "$eval_sets" ] || eval_sets=$train_set
[ -n "$stats_dir" ] || stats_dir=${expdir}_stats

log() { echo "=== $(date +%T) $*"; }

if [ $stage -le 1 ] && [ $stop_stage -ge 1 ]; then
  log "stage 1: data preparation (local/data.sh)"
  if [ -x local/data.sh ]; then ./local/data.sh; fi
  for d in $train_set $valid_set $eval_sets; do
    [ -f "$d/wav.scp" ] && [ -f "$d/text" ] || { echo "missing $d"; exit 1; }
  done
fi

if [ $stage -le 2 ] && [ $stop_stage -ge 2 ]; then
  log "stage 2: token list ($token_type)"
  extra=""
  [ -n "$g2p" ] && extra="$extra --g2p $g2p"
  [ -n "$cleaner" ] && extra="$extra --cleaner $cleaner"
  $python -m espnet_tpu.bin.tokenize_text \
    -i $train_set/text -o $tokens -f 2- -t $token_type \
    --write_vocabulary true \
    --add_symbol '<blank>:0' --add_symbol '<unk>:1' \
    --add_symbol '<sos/eos>:-1' $extra
  echo "vocab: $(wc -l < $tokens)"
fi

if [ $stage -le 3 ] && [ $stop_stage -ge 3 ]; then
  log "stage 3: feats collect-stats"
  $python -m espnet_tpu.bin.tts_train \
    --collect_stats true \
    --train_data $train_set/wav.scp,speech,sound \
    --train_data $train_set/text,text,text \
    --token_list $tokens --expdir $expdir --stats_dir $stats_dir \
    --config $tts_config
fi

if [ $stage -le 4 ] && [ $stop_stage -ge 4 ]; then
  log "stage 4: TTS training"
  $python -m espnet_tpu.bin.tts_train \
    --train_data $train_set/wav.scp,speech,sound \
    --train_data $train_set/text,text,text \
    --valid_data $valid_set/wav.scp,speech,sound \
    --valid_data $valid_set/text,text,text \
    --token_list $tokens --expdir $expdir --stats_dir $stats_dir \
    --config $tts_config
fi

if [ $stage -le 5 ] && [ $stop_stage -ge 5 ]; then
  log "stage 5: synthesis (Griffin-Lim wavs)"
  for eset in $eval_sets; do
    name=$(basename $eset)
    $python -m espnet_tpu.bin.tts_inference \
      --text $eset/text \
      --config $expdir/config.yaml \
      --ckpt $expdir/latest.ckpt \
      --output_dir $expdir/synth_$name
    ls $expdir/synth_$name/wav/ | head -3
  done
fi

if [ $stage -le 6 ] && [ $stop_stage -ge 6 ]; then
  log "stage 6: MCD evaluation"
  for eset in $eval_sets; do
    name=$(basename $eset)
    $python - "$expdir/synth_$name/wav" <<'PYEOF'
import sys
from pathlib import Path
d = Path(sys.argv[1])
lines = [f"{w.stem} {w.resolve()}" for w in sorted(d.glob("*.wav"))]
(d.parent / "hyp_wav.scp").write_text("\n".join(lines) + "\n")
PYEOF
    # MCD at the corpus's own STFT scale (from feats_extract_conf)
    read mcd_fs mcd_nfft mcd_hop <<< $($python - "$tts_config" <<'PYEOF2'
import sys, yaml
c = yaml.safe_load(open(sys.argv[1])) or {}
fc = c.get("feats_extract_conf", {})
print(fc.get("fs", 16000), fc.get("n_fft", 1024), fc.get("hop_length", 256))
PYEOF2
)
    $python -m espnet_tpu.bin.mcd_calculate \
      --ref $eset/wav.scp \
      --hyp $expdir/synth_$name/hyp_wav.scp \
      --fs $mcd_fs --n_fft $mcd_nfft --hop_length $mcd_hop \
      --out $expdir/synth_$name/mcd.json || true
    cat $expdir/synth_$name/mcd.json 2>/dev/null || true
  done
  log "done"
fi
