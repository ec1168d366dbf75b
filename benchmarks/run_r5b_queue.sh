#!/bin/bash
# Round-5 second-half TPU queue: everything after the cond-affine flagship
# SBC. ONE TPU process at a time (CLAUDE.md); every stage is gated behind a
# compute-health probe (tpu_wait_then.sh) because the axon relay wedged
# twice today, and skips itself if its artifact already exists — so the
# whole queue is a single relaunchable command after any crash.
#
# Stage order (round-4 VERDICT):
#   0. affine5 resume  — finish the cond-affine flagship SBC 96x600
#                        (VERDICT #1/#2; NUTS segment checkpoints make the
#                        relaunch a cheap replay of finished groups).
#   1. goldp5          — golden parity at the reference's 10k budget with
#                        the calibrated + cond-affine stack (VERDICT #3).
#   2/3. hierp5a/b     — hierarchical hyperparameter coverage at power:
#                        2 x 10 reps x 5 dims = 100 intervals per
#                        hyperparameter, affine estimator (VERDICT #7).
set -u
cd /root/repo
export MODEL_DIR="${MODEL_DIR:-/root/repo/artifacts/models}"
WAIT=benchmarks/tpu_wait_then.sh
stamp() { date +%H:%M:%S; }

if [ ! -f artifacts/calibration_affine10m_slice_96/summary.json ]; then
  echo "$(stamp) [affine5] resume cond-affine flagship SBC"
  bash "$WAIT" timeout 14000 python benchmarks/calibration_run.py \
    --sims 10000000 --datasets 96 --post-samples 600 --chains 4 --warmup 200 \
    --pt-replicas 6 --pt-beta-min 0.04 --censor-rt --rt-rep shifted_log \
    --log-theta --tau-slice --cond-affine --reuse-model \
    --model mnle_10m_shifted_logt_affine.npz \
    --outdir artifacts/calibration_affine10m_slice_96 \
    > /tmp/r5_affine_sbc3.log 2>&1
  echo "$(stamp) [affine5] exit=$?"
else
  echo "$(stamp) [affine5] SKIPPED (summary exists)"
fi

if [ ! -f artifacts/likelihood_slope_affine.json ]; then
  echo "$(stamp) [slope5] tau likelihood-profile slope of the affine model"
  bash "$WAIT" timeout 1800 python benchmarks/likelihood_slope.py \
    --models mnle_10m_shifted_logt_affine.npz \
    --dims 4 --datasets 4 --points 11 --reps 1024 \
    --out artifacts/likelihood_slope_affine.json \
    > /tmp/r5_slope.log 2>&1
  echo "$(stamp) [slope5] exit=$?"
else
  echo "$(stamp) [slope5] SKIPPED (artifact exists)"
fi

if [ ! -f artifacts/golden_parity_calibrated.json ]; then
  echo "$(stamp) [goldp5] golden parity, calibrated + cond-affine stack"
  bash "$WAIT" timeout 5400 python benchmarks/golden_parity.py \
    --calibrated --cond-affine \
    --out artifacts/golden_parity_calibrated.json \
    > /tmp/r5_goldp.log 2>&1
  echo "$(stamp) [goldp5] exit=$?"
else
  echo "$(stamp) [goldp5] SKIPPED (artifact exists)"
fi

if [ ! -f artifacts/hierarchical_coverage_affine_a.json ]; then
  echo "$(stamp) [hierp5a] hierarchical coverage 10 reps, affine model"
  bash "$WAIT" timeout 5400 python benchmarks/hierarchical_coverage.py \
    --reps 10 --subjects 4 --trials 20 --chains 4 --warmup 250 \
    --samples 300 --max-depth 8 --pt-replicas 6 --batch-reps --seed 21 \
    --model mnle_10m_shifted_logt_affine.npz \
    --out artifacts/hierarchical_coverage_affine_a.json \
    > /tmp/r5_hier_a.log 2>&1
  echo "$(stamp) [hierp5a] exit=$?"
else
  echo "$(stamp) [hierp5a] SKIPPED (artifact exists)"
fi

if [ ! -f artifacts/hierarchical_coverage_affine_b.json ]; then
  echo "$(stamp) [hierp5b] hierarchical coverage 10 reps, affine model"
  bash "$WAIT" timeout 5400 python benchmarks/hierarchical_coverage.py \
    --reps 10 --subjects 4 --trials 20 --chains 4 --warmup 250 \
    --samples 300 --max-depth 8 --pt-replicas 6 --batch-reps --seed 31 \
    --model mnle_10m_shifted_logt_affine.npz \
    --out artifacts/hierarchical_coverage_affine_b.json \
    > /tmp/r5_hier_b.log 2>&1
  echo "$(stamp) [hierp5b] exit=$?"
else
  echo "$(stamp) [hierp5b] SKIPPED (artifact exists)"
fi

echo "$(stamp) queue done"
