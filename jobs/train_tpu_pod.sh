#!/bin/bash
# Multi-host TPU-pod training launcher (counterpart of the reference's SLURM
# DDP scripts, jobs/clip_base.sh). Run the same command on every host of the
# pod slice (e.g. via `gcloud compute tpus tpu-vm ssh --worker=all`); jax
# discovers the topology and avex-tpu shards the batch over the full mesh.
set -euo pipefail
CONFIG=${1:?usage: train_tpu_pod.sh <run_config.yml> [patches...]}
shift || true
python -m avex_tpu.cli train -c "$CONFIG" -p distributed=true "$@"
