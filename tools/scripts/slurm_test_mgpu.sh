#!/usr/bin/env bash
# SLURM multi-host eval launcher (reference slurm_test_mgpu.sh).
set -x
PARTITION=$1
NTASKS=$2
PY_ARGS=${@:3}

GPUS_PER_NODE=${GPUS_PER_NODE:-1}
CPUS_PER_TASK=${CPUS_PER_TASK:-8}
SRUN_ARGS=${SRUN_ARGS:-""}

srun -p ${PARTITION} \
    --job-name=eval \
    --ntasks=${NTASKS} \
    --ntasks-per-node=${GPUS_PER_NODE} \
    --cpus-per-task=${CPUS_PER_TASK} \
    --kill-on-bad-exit=1 \
    ${SRUN_ARGS} \
    python -u tools/test.py --dist ${PY_ARGS}
