#!/usr/bin/env bash
# Synthesize speech for one sentence with a trained TTS model — the
# reference's utils/synth_wav.sh demo flow, over espnet_tpu.bin.tts_inference.
#
# Usage: tools/synth_wav.sh --config exp/tts/config.yaml \
#          --ckpt exp/tts/valid.loss.best.ckpt --out out_dir "HELLO WORLD"
set -euo pipefail

args=()
text=""
out="synth_wav_out"
while [ $# -gt 0 ]; do
  case "$1" in
    --out) out="$2"; shift 2 ;;
    --*) args+=("$1" "$2"); shift 2 ;;
    *) text="$1"; shift ;;
  esac
done
[ -n "$text" ] || { echo "usage: $0 --config C --ckpt K [--out DIR] \"TEXT\"" >&2; exit 2; }

tmpdir=$(mktemp -d)
trap 'rm -rf "$tmpdir"' EXIT
echo "utt1 $text" > "$tmpdir/text.scp"

mkdir -p "$out"
python -m espnet_tpu.bin.tts_inference \
  --text "$tmpdir/text.scp" --output_dir "$out" "${args[@]}"

echo "=== wrote:"
ls "$out"/*.wav "$out"/wav/*.wav 2>/dev/null || ls "$out"
