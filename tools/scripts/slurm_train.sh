#!/usr/bin/env bash
# SLURM launcher (reference tools/scripts/slurm_train.sh): one task per
# host; jax.distributed reads the SLURM env (coordinator = first node).
set -x
PARTITION=$1
JOB_NAME=$2
NTASKS=$3
PY_ARGS=${@:4}

GPUS_PER_NODE=${GPUS_PER_NODE:-1}
CPUS_PER_TASK=${CPUS_PER_TASK:-8}
SRUN_ARGS=${SRUN_ARGS:-""}

srun -p ${PARTITION} \
    --job-name=${JOB_NAME} \
    --ntasks=${NTASKS} \
    --ntasks-per-node=${GPUS_PER_NODE} \
    --cpus-per-task=${CPUS_PER_TASK} \
    --kill-on-bad-exit=1 \
    ${SRUN_ARGS} \
    python -u tools/train.py --dist ${PY_ARGS}
