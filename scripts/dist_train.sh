#!/usr/bin/env bash
# Multi-device training launcher.
#
# The reference launches one torch process per GPU with NCCL
# (BasicSR/scripts/dist_train.sh). On TPU the framework is single-controller
# SPMD: ONE process drives the whole mesh and XLA inserts the collectives,
# so "distributed" training is just run.py — the mesh size comes from
# num_gpu / the parallel: block in the YAML. This script is kept for CLI
# compatibility; the first argument (process count) is mapped to num_gpu.
#
# Multi-host TPU pods (one process per host, DCN-spanning mesh): run this
# same command on EVERY host of the pod slice. On Cloud TPU the cluster
# auto-detects (bsvd_tpu.parallel.mesh.init_distributed -> bare
# jax.distributed.initialize); elsewhere set, per host,
#   BSVD_COORDINATOR=<host0>:<port> BSVD_NUM_PROCESSES=<n> BSVD_PROCESS_ID=<i>
# (or launch under slurm — SLURM_* vars are resolved like the reference's
# dist_util). jax.devices() then spans all hosts and the mesh/shardings are
# unchanged. See tests/test_multihost.py for a 2-process worked example.
set -e
NUM_DEVICES=${1:-auto}
OPT=$2
shift 2 || true
python run.py -opt "$OPT" --force_yml num_gpu=$NUM_DEVICES "$@"
