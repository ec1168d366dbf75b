#!/bin/bash
# Round-3 tail queue (after the flagship + roof + thr preemption).
# Rationale (2026-08-18 ~23:10): e4b (1M shifted re-run) demoted — the 10M
# flagship already answered the shifted-log question (tau bias estimator-level,
# onset wall breaks NUTS mixing), and a 1M variant adds no headline. The
# remaining chip time goes to VERDICT #6 (hierarchical coverage with PT, no
# TPU result yet). Model: mnle_1m_censor.npz — the best-characterized mixing
# profile (PT6 ladder measured rhat<=1.25 at 96-dataset power); the shifted
# flagship model is excluded because its exact-onset potential measurably
# breaks NUTS mixing (calibration_shifted10m_96: rhat_max 1.9e5).
set -u
cd /root/repo
export MODEL_DIR="${MODEL_DIR:-/root/repo/artifacts/models}"
DEADLINE=${DEADLINE:?set DEADLINE epoch seconds}

stamp() { date +%H:%M:%S; }
remaining() { echo $(( DEADLINE - $(date +%s) )); }

# Wait for the in-flight mcmc_throughput sweep (ONE TPU process rule).
while ps -p "${THR_PID:?set THR_PID}" > /dev/null 2>&1; do
  echo "$(stamp) waiting for thr (pid $THR_PID), $(remaining)s left"
  sleep 60
done
echo "$(stamp) thr done; $(remaining)s to deadline"

R=$(remaining)
if [ "$R" -ge 2700 ]; then
  echo "$(stamp) [hier] hierarchical coverage with PT (VERDICT #6), budget $((R-240))s"
  timeout $(( R - 240 )) python benchmarks/hierarchical_coverage.py \
    --reps 10 --seed 7 --max-depth 10 --pt-replicas 6 --pt-beta-min 0.04 \
    --batch-reps --model mnle_1m_censor.npz \
    --out artifacts/hierarchical_coverage_pt.json \
    > /tmp/q_hier.log 2>&1
  echo "$(stamp) [hier] exit=$?"
else
  echo "$(stamp) [hier] SKIPPED ($R s left)"
fi
echo "$(stamp) tail queue done ($(remaining)s to deadline)"
