#!/bin/bash
# Round-4 TPU experiment queue, staged at the end of round 3 so the next
# session can launch immediately. ONE TPU process at a time (CLAUDE.md).
# Derived from the round-3 endgame decomposition (BENCH_NOTES):
#   - tau bias is estimator-level; shifted_log fixed the density leak but
#     its onset wall breaks leapfrog -> the retry adds the tau-slice kernel
#     (MCMC_TAU_SLICE / --tau-slice, unit-tested, TPU-verified round 3).
#   - hierarchical PT must run at max_tree_depth 8 (depth 10 crashes the
#     axon worker deterministically on the 30-dim joint launch).
# Stages:
#   flag4 — flagship retry: 10M shifted_log+logt SBC 96x600, PT6 + tau-slice
#           (reuses the round-3 trained mnle_10m_shifted_logt.npz)
#   onset — if tau STILL fails in the well-mixed subset, the bias is in the
#           learned decision-time density near onset; fall back to the
#           censored "log" rep + tau-slice to separate wall-handling from
#           representation (cheap: reuses mnle_10m_censor-equivalent budget)
#   hier4 — mu under-coverage follow-up: 8 subjects x 40 trials. The
#           round-3-tail exact-likelihood control (hierarchical_exact_check:
#           mu 0.925 / log_tau 0.895, PASS) exonerated the hierarchy +
#           sampler chain, so the deficit is estimator-level; prediction
#           here: mu coverage DROPS further at S=8 (shared MNLE bias folds
#           S-fold while the posterior narrows). A rise toward 0.9 would
#           falsify that attribution.
set -u
cd /root/repo
export MODEL_DIR="${MODEL_DIR:-/root/repo/artifacts/models}"
DEADLINE=${DEADLINE:-$(( $(date +%s) + 43200 ))}
stamp() { date +%H:%M:%S; }
remaining() { echo $(( DEADLINE - $(date +%s) )); }
have() { [ "$(remaining)" -ge "$1" ]; }

echo "$(stamp) waiting for TPU... (deadline in $(remaining)s)"
until timeout 300 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
  echo "$(stamp) tpu still down"
  have 1200 || { echo "$(stamp) deadline reached while waiting; abort"; exit 1; }
  sleep 120
done
echo "$(stamp) TPU BACK — starting queue ($(remaining)s to deadline)"

if have 7200; then
  echo "$(stamp) [flag4] 10M shifted_log SBC with PT6 + tau-slice"
  timeout 7200 python benchmarks/calibration_run.py \
    --sims 10000000 --datasets 96 --post-samples 600 --chains 4 --warmup 200 \
    --pt-replicas 6 --pt-beta-min 0.04 --censor-rt --rt-rep shifted_log \
    --log-theta --tau-slice --reuse-model --model mnle_10m_shifted_logt.npz \
    --outdir artifacts/calibration_shifted10m_slice_96 \
    > /tmp/q_flag4.log 2>&1
  echo "$(stamp) [flag4] exit=$?"
else
  echo "$(stamp) [flag4] SKIPPED (deadline)"
fi

if have 7200; then
  echo "$(stamp) [onset] censored log rep + tau-slice (representation control)"
  timeout 7200 python benchmarks/calibration_run.py \
    --sims 10000000 --datasets 96 --post-samples 600 --chains 4 --warmup 200 \
    --pt-replicas 6 --pt-beta-min 0.04 --censor-rt \
    --log-theta --tau-slice --model mnle_10m_censor_logt.npz \
    --outdir artifacts/calibration_censor10m_slice_96 \
    > /tmp/q_onset.log 2>&1
  echo "$(stamp) [onset] exit=$?"
else
  echo "$(stamp) [onset] SKIPPED (deadline)"
fi

if have 2700; then
  echo "$(stamp) [hier4] 8 subjects x 40 trials coverage (mu power test)"
  # Work-per-transition envelope: depth-10 x 80-trial crashed the worker
  # 3/3; depth-8 x 80-trial ran clean (round-3 finding). 8 subjects x 40
  # trials quadruples the per-leapfrog potential cost, so stay a depth
  # lower (2^7 x 320 ~= the proven 2^8 x 80 work level) and halve the
  # rows per launch (2 reps x 4 chains x 6 replicas = 48).
  timeout 2400 python benchmarks/hierarchical_coverage.py \
    --reps 2 --seed 21 --subjects 8 --trials 40 --max-depth 7 \
    --pt-replicas 6 --pt-beta-min 0.04 --batch-reps \
    --model mnle_1m_censor.npz \
    --out artifacts/hierarchical_coverage_pt_s8.json \
    > /tmp/q_hier4.log 2>&1
  echo "$(stamp) [hier4] exit=$?"
else
  echo "$(stamp) [hier4] SKIPPED (deadline)"
fi
echo "$(stamp) queue done ($(remaining)s to deadline)"
