#!/usr/bin/env bash
# Decode a single wav file with a trained model — the reference's
# utils/recog_wav.sh demo flow, over espnet_tpu.bin.asr_recog.
#
# Usage: tools/recog_wav.sh --config exp/asr/config.yaml \
#          --ckpt exp/asr/valid.loss.best.ckpt [decode opts...] file.wav
set -euo pipefail

args=()
wav=""
while [ $# -gt 0 ]; do
  case "$1" in
    *.wav|*.flac|*.sph) wav="$1"; shift ;;
    *) args+=("$1"); shift ;;
  esac
done
[ -n "$wav" ] || { echo "usage: $0 --config C --ckpt K [opts] file.wav" >&2; exit 2; }
[ -f "$wav" ] || { echo "no such file: $wav" >&2; exit 2; }

tmpdir=$(mktemp -d)
trap 'rm -rf "$tmpdir"' EXIT
uttid=$(basename "$wav" | sed 's/\.[^.]*$//')
echo "$uttid $(readlink -f "$wav")" > "$tmpdir/wav.scp"

python -m espnet_tpu.bin.asr_recog \
  --data "$tmpdir/wav.scp,speech,sound" \
  --output_dir "$tmpdir/decode" "${args[@]}"

echo "=== hypothesis"
cat "$tmpdir/decode/hyp.trn" 2>/dev/null || cat "$tmpdir/decode"/text* 2>/dev/null
