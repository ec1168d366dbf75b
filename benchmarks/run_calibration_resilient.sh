#!/bin/bash
# Process-level retry wrapper around the calibration run: the single-chip
# tunnel occasionally crashes its worker, and a call into a dead relay can
# HANG rather than raise — so each attempt gets a hard timeout
# (ATTEMPT_TIMEOUT, default 45 min). run_nuts checkpoints every segment to
# disk, so a fresh process resumes exactly where the last one died.
set -u
for attempt in $(seq 1 "${MAX_ATTEMPTS:-10}"); do
  echo "=== calibration attempt $attempt $(date +%H:%M:%S) ==="
  MODEL_DIR="${MODEL_DIR:-/root/repo/artifacts/models}" \
    timeout "${ATTEMPT_TIMEOUT:-2700}" \
    python -u benchmarks/calibration_run.py "$@" && exit 0
  echo "attempt $attempt failed; waiting for device recovery"
  for probe in $(seq 1 20); do
    timeout 45 python -c "import jax, jax.numpy as j, numpy as n; n.asarray(j.ones((8,)).sum())" 2>/dev/null && break
    sleep 45
  done
done
echo "calibration did not complete after ${MAX_ATTEMPTS:-10} attempts"
exit 1
