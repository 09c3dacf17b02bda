#!/bin/bash
#SBATCH --job-name=avex-tpu-eval
#SBATCH --array=0-9
# Evaluation array job (≈ reference jobs/eval_array.sh): one benchmark config
# per array index, listed in jobs/eval_configs.txt.
set -euo pipefail
CONFIG=$(sed -n "$((SLURM_ARRAY_TASK_ID + 1))p" jobs/eval_configs.txt)
python -m avex_tpu.cli evaluate -c "$CONFIG"
