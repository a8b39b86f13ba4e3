#!/usr/bin/env bash
# Multi-device training launcher.
#
# The reference launches one torch process per GPU with NCCL
# (BasicSR/scripts/dist_train.sh). On TPU the framework is single-controller
# SPMD: ONE process drives the whole mesh and XLA inserts the collectives,
# so "distributed" training is just run.py — the mesh size comes from
# num_gpu / the parallel: block in the YAML. This script is kept for CLI
# compatibility; the first argument (process count) is mapped to num_gpu.
set -e
NUM_DEVICES=${1:-auto}
OPT=$2
shift 2 || true
python run.py -opt "$OPT" --force_yml num_gpu=$NUM_DEVICES "$@"
