#!/usr/bin/env bash
# Transducer decode autopsy (VERDICT r4 next-round #3): why did ALSD
# beam-5 (31.5 %) lose to greedy (24.7 %) in round 4? Grid over
# {score_norm on/off} × {blank penalty} × {LM weight 0/0.3} on the
# trained synth1k transducer; reference semantics
# beam_search_transducer.py:115-128 (score_norm divides by |yseq| —
# under an onset-repeat pathology long hypotheses are FAVORED by the
# normalization, so score_norm off is the prime-suspect ablation).
#
#   ./run_transducer_ablate.sh
set -euo pipefail
cd "$(dirname "$0")"
export PYTHONPATH="$(cd ../..; pwd):${PYTHONPATH:-}"

expdir=exp
asrdir=$expdir/asr_transducer
test_set=data/test
ck=$asrdir/valid.loss.best.ckpt
lm="--lm_config $expdir/lm/config.yaml --lm_ckpt $expdir/lm/valid.loss.best.ckpt"

decode () {  # decode <outdir> <extra args...>
  local name=$1 outdir=$asrdir/$1; shift
  python -m espnet_tpu.bin.asr_recog \
    --data $test_set/wav.scp,speech,sound --text $test_set/text \
    --config $asrdir/config.yaml --ckpt $ck \
    --output_dir $outdir --batch_size 16 "$@"
  python - <<PY
import json; s = json.load(open("$outdir/summary.json"))
print("$name:", json.dumps(s))
PY
}

echo "=== greedy baselines"
decode abl_greedy      --transducer_search greedy
decode abl_greedy_ms1  --transducer_search greedy --transducer_max_symbols 1

echo "=== ALSD batched beam 5: score_norm x blank_penalty x LM"
decode abl_alsd_norm       --transducer_search alsd_batch --beam_size 5
decode abl_alsd_nonorm     --transducer_search alsd_batch --beam_size 5 \
  --transducer_score_norm false
decode abl_alsd_norm_bp1   --transducer_search alsd_batch --beam_size 5 \
  --transducer_blank_penalty 1.0
decode abl_alsd_nonorm_bp1 --transducer_search alsd_batch --beam_size 5 \
  --transducer_score_norm false --transducer_blank_penalty 1.0
decode abl_alsd_norm_lm03   --transducer_search alsd_batch --beam_size 5 \
  $lm --lm_weight 0.3
decode abl_alsd_nonorm_lm03 --transducer_search alsd_batch --beam_size 5 \
  --transducer_score_norm false $lm --lm_weight 0.3

echo "=== host default beam 5 (same grid, host algorithm cross-check)"
decode abl_def_norm       --transducer_search default --beam_size 5
decode abl_def_nonorm     --transducer_search default --beam_size 5 \
  --transducer_score_norm false
decode abl_def_nonorm_lm03 --transducer_search default --beam_size 5 \
  --transducer_score_norm false $lm --lm_weight 0.3

echo "=== transducer ablation done"
