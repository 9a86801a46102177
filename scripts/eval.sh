#!/usr/bin/env bash
# Continuous eval loop (mirror of reference scripts/eval.sh): re-evaluates
# the newest checkpoint forever; restarts after crashes.
MODEL="$1"; shift || true
MODEL_DIR="${TF_MODELS_PATH}/${MODEL}"
mkdir -p "${MODEL_DIR}"
cd "$(dirname "$0")"
while true; do
  python eval.py --model="${MODEL}" "$@" 2>&1 | tee -a "${MODEL_DIR}/log_eval.txt"
  sleep 30
done
