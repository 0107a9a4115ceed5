#!/usr/bin/env bash
# Librispeech-100h Conformer recipe — thin wrapper over the generic
# TEMPLATE driver (recipes/TEMPLATE/asr.sh ↔ egs2 asr.sh).
#
# Expects Kaldi-style data dirs prepared externally (this environment
# has no network access to download Librispeech):
#   data/{train_clean_100,dev_clean,test_clean}/{wav.scp,text}
#
# Reference hyperparameters: egs/librispeech/asr1/conf/tuning/
# train_pytorch_conformer_large.yaml (SURVEY A.4) scaled into
# conf/train_conformer.yaml; BPE 5000; speed perturb 0.9/1.0/1.1.
set -euo pipefail
cd "$(dirname "$0")"
export PYTHONPATH="$(cd ../..; pwd):${PYTHONPATH:-}"

exec ../TEMPLATE/asr.sh \
  --train_set data/train_clean_100 \
  --valid_set data/dev_clean \
  --test_sets "data/dev_clean data/test_clean" \
  --asr_config conf/train_conformer.yaml \
  --lm_config conf/lm_transformer.yaml \
  --token_type bpe --nbpe 5000 \
  --speed_perturb_factors "0.9 1.0 1.1" \
  --beam_size 60 --ctc_weight 0.4 --lm_weight 0.6 \
  "$@"
