#!/usr/bin/env bash
# Training wrapper with log teeing (mirror of reference scripts/train.sh).
# Usage: ./train.sh <model_name> [extra flags...]
set -e
MODEL="$1"; shift || true
MODEL_DIR="${TF_MODELS_PATH}/${MODEL}"
mkdir -p "${MODEL_DIR}"
cd "$(dirname "$0")"
python train.py --model="${MODEL}" "$@" 2>&1 | tee -a "${MODEL_DIR}/log_train.txt"
