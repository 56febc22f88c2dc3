#!/usr/bin/env bash
# Single-task SLURM eval launcher (reference tools/scripts/slurm_test_single.sh):
# one process, one accelerator — no jax.distributed init needed.
set -x
PARTITION=$1
PY_ARGS=${@:2}

SRUN_ARGS=${SRUN_ARGS:-""}

srun -p ${PARTITION} \
    --job-name=eval \
    --ntasks=1 \
    --ntasks-per-node=1 \
    --kill-on-bad-exit=1 \
    ${SRUN_ARGS} \
    python -u tools/test.py ${PY_ARGS}
