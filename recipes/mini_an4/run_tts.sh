#!/usr/bin/env bash
# mini_an4 TTS recipe on REAL AN4 speech (analog of egs/mini_an4/tts1):
# data prep → phoneme tokens (lexicon g2p from the corpus dictionary) →
# feats stats → Tacotron2 (forward_ta) training → Griffin-Lim synthesis.
#
#   ./run_tts.sh [--stage N] [--stop_stage M]
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

train_set=$datadir/train   # all 5 utterances (micro corpus)
tokens=$datadir/phn_tokens.txt
lexicon=downloads/an4/etc/an4.dic

if [ $stage -le 0 ] && [ $stop_stage -ge 0 ]; then
  echo "=== stage 0: data preparation"
  python local/data_prep.py --tarball "$tarball" --workdir .
fi

if [ $stage -le 1 ] && [ $stop_stage -ge 1 ]; then
  echo "=== stage 1: phoneme token list (lexicon g2p)"
  python -m espnet_tpu.bin.tokenize_text \
    -i $train_set/text -o $tokens -f 2- -t phn --g2p "lexicon:$lexicon" \
    --write_vocabulary true \
    --add_symbol '<blank>:0' --add_symbol '<unk>:1' --add_symbol '<sos/eos>:-1'
  echo "phoneme vocab: $(wc -l < $tokens)"
fi

if [ $stage -le 2 ] && [ $stop_stage -ge 2 ]; then
  echo "=== stage 2: feats stats"
  python -m espnet_tpu.bin.tts_train \
    --collect_stats true \
    --train_data $train_set/wav.scp,speech,sound \
    --train_data $train_set/text,text,text \
    --token_list $tokens --expdir $expdir/tts --stats_dir $expdir/tts_stats \
    --config conf/train_tacotron2.yaml
fi

if [ $stage -le 3 ] && [ $stop_stage -ge 3 ]; then
  echo "=== stage 3: Tacotron2 training"
  python -m espnet_tpu.bin.tts_train \
    --train_data $train_set/wav.scp,speech,sound \
    --train_data $train_set/text,text,text \
    --valid_data $train_set/wav.scp,speech,sound \
    --valid_data $train_set/text,text,text \
    --token_list $tokens --expdir $expdir/tts --stats_dir $expdir/tts_stats \
    --config conf/train_tacotron2.yaml
fi

if [ $stage -le 4 ] && [ $stop_stage -ge 4 ]; then
  echo "=== stage 4: synthesis (Griffin-Lim)"
  python -m espnet_tpu.bin.tts_inference \
    --text $train_set/text \
    --config $expdir/tts/config.yaml \
    --ckpt $expdir/tts/latest.ckpt \
    --output_dir $expdir/tts/synth
  ls -la $expdir/tts/synth/wav/
fi

if [ $stage -le 5 ] && [ $stop_stage -ge 5 ]; then
  echo "=== stage 5: MCD evaluation (synth vs real)"
  python - <<'PYEOF'
from pathlib import Path
lines = [f"{w.stem} {w.resolve()}" for w in sorted(Path('exp/tts/synth/wav').glob('*.wav'))]
Path('exp/tts/synth/hyp_wav.scp').write_text("\n".join(lines))
PYEOF
  python -m espnet_tpu.bin.mcd_calculate \
    --ref data/train/wav.scp --hyp exp/tts/synth/hyp_wav.scp \
    --out exp/tts/synth/mcd.json
fi
