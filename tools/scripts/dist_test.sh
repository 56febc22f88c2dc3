#!/usr/bin/env bash
# Multi-host eval launcher; rank-sharded val set, results merged with
# process_allgather (no filesystem rendezvous).
set -euo pipefail
PY_ARGS=${@:1}
python tools/test.py ${PY_ARGS}
