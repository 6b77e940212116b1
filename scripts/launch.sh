#!/usr/bin/env bash
# Multi-host TPU launcher (capability parity with ev-NSFnet/train.sh, which
# drives torchrun+NCCL under SLURM).
#
# On a TPU pod slice, run this same script on EVERY host (e.g. via
# `gcloud compute tpus tpu-vm ssh ... --worker=all --command="bash scripts/launch.sh"`).
# jax.distributed.initialize() picks coordinator/rank from the TPU runtime
# metadata automatically; no rendezvous env plumbing is needed (replaces
# MASTER_ADDR/MASTER_PORT/RANK/WORLD_SIZE, train.sh:15-29).
set -euo pipefail

CONFIG="${1:-configs/re5000_production.yaml}"

# Robustness env (NCCL_TIMEOUT / BLOCKING_WAIT analogue, train.sh:16-22):
# fail fast on collective hangs instead of stalling the pod.
export JAX_COORDINATION_SERVICE_HEARTBEAT_TIMEOUT_SECONDS="${JAX_COORDINATION_SERVICE_HEARTBEAT_TIMEOUT_SECONDS:-100}"

# Persistent compile cache across restarts.
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$PWD/.jax_cache}"

exec python -m nsfnet_tpu.train --config "$CONFIG" "${@:2}"
