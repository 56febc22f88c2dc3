#!/usr/bin/env bash
# Multi-host training launcher (TPU-native replacement for the reference's
# torch.distributed.launch script): launch this once per TPU host; jax
# discovers the coordinator from the TPU runtime (or set
# JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID for CPU/GPU
# style bring-up).  All chips across hosts form one dp mesh over ICI/DCN.
set -euo pipefail
PY_ARGS=${@:1}
python tools/train.py --dist ${PY_ARGS}
