#!/usr/bin/env bash
# Multi-device eval launcher (see dist_train.sh for the SPMD note).
set -e
NUM_DEVICES=${1:-auto}
OPT=$2
shift 2 || true
python run_test.py -opt "$OPT" --force_yml num_gpu=$NUM_DEVICES "$@"
