#!/usr/bin/env bash
# CTC-align a transcript to a single wav file — the reference's
# utils/asr_align_wav.sh demo flow, over espnet_tpu.bin.asr_align.
#
# Usage: tools/asr_align_wav.sh --config exp/asr/config.yaml \
#          --ckpt exp/asr/valid.loss.best.ckpt \
#          --transcript "HELLO WORLD" file.wav
set -euo pipefail

args=()
wav=""
transcript=""
while [ $# -gt 0 ]; do
  case "$1" in
    --transcript) transcript="$2"; shift 2 ;;
    *.wav|*.flac|*.sph) wav="$1"; shift ;;
    *) args+=("$1"); shift ;;
  esac
done
[ -n "$wav" ] || { echo "usage: $0 --config C --ckpt K --transcript T file.wav" >&2; exit 2; }
[ -f "$wav" ] || { echo "no such file: $wav" >&2; exit 2; }
[ -n "$transcript" ] || { echo "missing --transcript" >&2; exit 2; }

tmpdir=$(mktemp -d)
trap 'rm -rf "$tmpdir"' EXIT
uttid=$(basename "$wav" | sed 's/\.[^.]*$//')
echo "$uttid $(readlink -f "$wav")" > "$tmpdir/wav.scp"
echo "$uttid $transcript" > "$tmpdir/text"

python -m espnet_tpu.bin.asr_align \
  --data "$tmpdir/wav.scp,speech,sound" \
  --text "$tmpdir/text" \
  --output "$tmpdir/segments" "${args[@]}"

echo "=== token segments (uttid token start_frame end_frame)"
cat "$tmpdir/segments"
