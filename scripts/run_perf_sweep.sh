#!/bin/bash
# Chained one-process-per-config perf sweep on the real TPU.
# Each process gets a grant-release sleep before it starts.
set -u
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"
export JAX_PLATFORMS=tpu

run() {
  echo "=== $* ===" >&2
  env "$@" timeout -k 5 600 python scripts/exp_r3i.py
  sleep 75
}

run BLOCK=128                 # control (current production config)
run BLOCK=256
run BLOCK=256 GROUP=64
run BLOCK=128 GROUP=64
run BLOCK=128 KF=8
run BLOCK=256 TILE=512
