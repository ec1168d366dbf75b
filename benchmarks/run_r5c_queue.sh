#!/bin/bash
# Round-5 consolidated TPU queue (supersedes run_r5b_queue.sh). ONE TPU
# process at a time (CLAUDE.md); every stage is gated behind a compute-
# health probe (tpu_wait_then.sh — the axon relay wedged twice today) and
# skips itself when its artifact exists, so the whole queue is a single
# relaunchable command after any crash.
#
# Evidence driving the order (round-4 VERDICT #1-#4, #7):
#   - The cond-affine flagship still overestimates tau (ranks mean ~227/600
#     at 68/96 datasets, mixed-only KS ~ 0.005): cond-affine alone narrows
#     the bias (-96 -> -73) but will not pass the oracle at 96.
#   - tail_sharp_k = 1.5 overcorrects to bias +126. An intermediate k on
#     top of the affine stack brackets zero: train k=0.9 and k=1.25, rank
#     them with cheap 16-dataset SBCs (direct oracle measurement; NUTS
#     program shapes match the flagship groups so compiles are cached),
#     then spend the full 96-dataset window on the winner only if it beats
#     the affine baseline (benchmarks/pick_r5_candidate.py).
#   - Golden parity (deterministic deliverable) runs BEFORE the candidate
#     gamble so a short TPU window still banks VERDICT #3.
set -u
cd /root/repo
export MODEL_DIR="${MODEL_DIR:-/root/repo/artifacts/models}"
WAIT=benchmarks/tpu_wait_then.sh
stamp() { date +%H:%M:%S; }

# 0. Finish the cond-affine flagship SBC (96x600 + mixing remediation).
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

# 1. Tau likelihood-profile slope of the affine model (third point for the
#    instrument: unsharp +7.6, sharp -78.5, affine = ?).
if [ ! -f artifacts/likelihood_slope_affine.json ]; then
  echo "$(stamp) [slope5] tau slope of the affine model"
  bash "$WAIT" timeout 1800 python benchmarks/likelihood_slope.py \
    --models mnle_10m_shifted_logt_affine.npz \
    --dims 4 --datasets 4 --points 11 --reps 1024 \
    --out artifacts/likelihood_slope_affine.json \
    > /tmp/r5_slope.log 2>&1
  echo "$(stamp) [slope5] exit=$?"
else
  echo "$(stamp) [slope5] SKIPPED (artifact exists)"
fi

# 2. Golden parity at the reference's 10k budget, calibrated + cond-affine
#    stack (VERDICT #3) — before the candidate gamble: banks a deliverable.
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

# 3/4. Train the two tail-sharp interpolation candidates (affine stack +
#      k; ~20 min each at the 10M budget).
for KV in "0.9 k09" "1.25 k125"; do
  set -- $KV
  K=$1; TAG=$2
  MODEL="mnle_10m_shifted_logt_affine_${TAG}.npz"
  if [ ! -f "$MODEL_DIR/$MODEL" ]; then
    echo "$(stamp) [train-$TAG] 10M affine + tail_sharp_k=$K"
    bash "$WAIT" timeout 3600 python benchmarks/calibration_run.py \
      --sims 10000000 --censor-rt --rt-rep shifted_log --log-theta \
      --cond-affine --tail-sharp-k "$K" --train-only \
      --model "$MODEL" --outdir "artifacts/calibration_${TAG}_train" \
      > "/tmp/r5_train_${TAG}.log" 2>&1
    echo "$(stamp) [train-$TAG] exit=$?"
  else
    echo "$(stamp) [train-$TAG] SKIPPED (model exists)"
  fi
done

# 5/6. Cheap 16-dataset SBC per candidate (same sampler stack as the
#      flagship; group shapes match -> compile-cache hits).
for KV in "0.9 k09" "1.25 k125"; do
  set -- $KV
  K=$1; TAG=$2
  MODEL="mnle_10m_shifted_logt_affine_${TAG}.npz"
  if [ ! -f "artifacts/calibration_${TAG}_16/summary.json" ]; then
    echo "$(stamp) [sbc16-$TAG] 16-dataset candidate SBC"
    bash "$WAIT" timeout 3600 python benchmarks/calibration_run.py \
      --sims 10000000 --datasets 16 --post-samples 600 --chains 4 \
      --warmup 200 --pt-replicas 6 --pt-beta-min 0.04 --censor-rt \
      --rt-rep shifted_log --log-theta --tau-slice --cond-affine \
      --tail-sharp-k "$K" --reuse-model --model "$MODEL" \
      --outdir "artifacts/calibration_${TAG}_16" \
      > "/tmp/r5_sbc16_${TAG}.log" 2>&1
    echo "$(stamp) [sbc16-$TAG] exit=$?"
  else
    echo "$(stamp) [sbc16-$TAG] SKIPPED (summary exists)"
  fi
done

# 7. Pick the winner and spend the full 96-dataset window on it (fresh
#    --seed 1 so dataset draws are independent of the 16-dataset gate).
PICK=$(python benchmarks/pick_r5_candidate.py | tail -1)
WMODEL=$(echo "$PICK" | cut -d' ' -f1)
WTAG=$(echo "$PICK" | cut -d' ' -f2)
if [ "$WMODEL" != "none" ] && [ ! -f "artifacts/calibration_${WTAG}_96/summary.json" ]; then
  WK=0.9; [ "$WTAG" = "k125" ] && WK=1.25
  echo "$(stamp) [full96] winner=$WTAG model=$WMODEL"
  bash "$WAIT" timeout 14000 python benchmarks/calibration_run.py \
    --sims 10000000 --datasets 96 --post-samples 600 --chains 4 \
    --warmup 200 --pt-replicas 6 --pt-beta-min 0.04 --censor-rt \
    --rt-rep shifted_log --log-theta --tau-slice --cond-affine \
    --tail-sharp-k "$WK" --reuse-model --model "$WMODEL" --seed 1 \
    --outdir "artifacts/calibration_${WTAG}_96" \
    > /tmp/r5_full96.log 2>&1
  echo "$(stamp) [full96] exit=$?"
else
  echo "$(stamp) [full96] SKIPPED (winner=$WTAG)"
fi

# 8/9. Hierarchical hyperparameter coverage at power: 2 x 10 reps x 5 dims
#      = 100 intervals per hyperparameter, affine estimator (VERDICT #7).
for SV in "21 a" "31 b"; do
  set -- $SV
  SEED=$1; TAG=$2
  if [ ! -f "artifacts/hierarchical_coverage_affine_${TAG}.json" ]; then
    echo "$(stamp) [hierp5$TAG] hierarchical coverage 10 reps seed $SEED"
    bash "$WAIT" timeout 5400 python benchmarks/hierarchical_coverage.py \
      --reps 10 --subjects 4 --trials 20 --chains 4 --warmup 250 \
      --samples 300 --max-depth 8 --pt-replicas 6 --batch-reps --seed "$SEED" \
      --model mnle_10m_shifted_logt_affine.npz \
      --out "artifacts/hierarchical_coverage_affine_${TAG}.json" \
      > "/tmp/r5_hier_${TAG}.log" 2>&1
    echo "$(stamp) [hierp5$TAG] exit=$?"
  else
    echo "$(stamp) [hierp5$TAG] SKIPPED (artifact exists)"
  fi
done

echo "$(stamp) queue done"
