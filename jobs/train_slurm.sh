#!/bin/bash
#SBATCH --job-name=avex-tpu-train
#SBATCH --ntasks-per-node=1
# SLURM launcher: avex_tpu.parallel.init_multihost discovers
# SLURM_PROCID/NTASKS/NODELIST and initializes multi-host jax
# (≈ reference distributed.py SLURM env discovery).
set -euo pipefail
srun python -m avex_tpu.cli train -c "$1" -p distributed=true "${@:2}"
