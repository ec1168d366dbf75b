#!/bin/bash
# Round-5 TPU experiment queue, staged at the end of round 4. ONE TPU
# process at a time (CLAUDE.md). Stages skip themselves if their artifact
# already exists.
#
# Round-4 state this queue starts from (see BENCH_NOTES "Round 4"):
#   - The round-4 flagship ran the tail-sharp variant of the retry stack
#     (10M shifted_log + logt + tail_sharp_k=1.5, PT6 + tau-slice). At 36/96
#     datasets the tau rank bias FLIPPED SIGN: ranks mean 426/600 (posterior
#     now UNDERestimates tau; KS p ~ 9e-5) vs round-3's 146.8/600
#     (overestimate) — a0/lam/v/B all uniform (KS p 0.11-0.54) with rhat
#     mostly ~1.0x. Partials + NUTS checkpoints:
#     artifacts/calibration_sharp10m_slice_96/.
#   - Attribution SETTLED by likelihood_slope_tau.json (estimator-only
#     profile sweep): sharp model slope(L_model - L_true) = -78.5/log-unit
#     along tau (reproduces the flip, sampler not involved); unsharp model
#     +7.6 (mild, matches round 3's direction). tail_sharp_k=1.5
#     overcorrects; the tau-slice kernel is exonerated.
#   - onset_density_check_sharp12.json: the underlying misfit is
#     OVER-SMOOTHED conditional densities for near-deterministic conditions
#     (not edge mass). The shipped MNLE_COND_AFFINE layer (conditional
#     location-scale before the splines, fused-kernel parity-tested) is the
#     structural fix candidate.
# Decision tree below: tausl attributes estimator-vs-sampler cheaply, then
# flag4u (the round-3 VERDICT's ORIGINAL experiment, unsharp) separates
# sharp from slice, then the cond-affine flagship is the fix candidate run.
set -u
cd /root/repo
export MODEL_DIR="${MODEL_DIR:-/root/repo/artifacts/models}"
DEADLINE=${DEADLINE:-$(( $(date +%s) + 43200 ))}
stamp() { date +%H:%M:%S; }
remaining() { echo $(( DEADLINE - $(date +%s) )); }
have() { [ "$1" -le "$(remaining)" ]; }

echo "$(stamp) waiting for TPU... (deadline in $(remaining)s)"
until timeout 300 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
  echo "$(stamp) tpu still down"
  have 1200 || { echo "$(stamp) deadline reached while waiting; abort"; exit 1; }
  sleep 120
done
echo "$(stamp) TPU BACK — starting queue ($(remaining)s to deadline)"

# tausl — DONE in round 4 (artifacts/likelihood_slope_tau.json); the gate
# below keeps it skipped unless the artifact is removed.
if [ ! -f artifacts/likelihood_slope_tau.json ] && have 1200; then
  echo "$(stamp) [tausl] tau likelihood-profile sweep"
  timeout 1200 python benchmarks/likelihood_slope.py \
    --models mnle_10m_shifted_logt_sharp.npz mnle_10m_shifted_logt.npz \
    --dims 4 --datasets 4 --points 11 --reps 1024 \
    --out artifacts/likelihood_slope_tau.json \
    > /tmp/q_tausl.log 2>&1
  echo "$(stamp) [tausl] exit=$?"
else
  echo "$(stamp) [tausl] SKIPPED (done/deadline)"
fi

# flag4u — the round-3 VERDICT #1 experiment EXACTLY as staged (unsharp
# shifted-log 10M + PT6 + tau-slice, 96x600, mixing gate + remediation).
# Post-tausl this is the most likely immediate PASS: the unsharp model's
# tau profile bias is +7.6/log-unit (10x smaller than anything previously
# measured) and its round-3 failure happened under rhat 1.9e5 mixing that
# the slice kernel has since fixed. RUN THIS FIRST.
if [ ! -f artifacts/calibration_shifted10m_slice_96/summary.json ] && have 9000; then
  echo "$(stamp) [flag4u] unsharp shifted 10M SBC with PT6 + tau-slice"
  timeout 9000 python benchmarks/calibration_run.py \
    --sims 10000000 --datasets 96 --post-samples 600 --chains 4 --warmup 200 \
    --pt-replicas 6 --pt-beta-min 0.04 --censor-rt --rt-rep shifted_log \
    --log-theta --tau-slice --reuse-model --model mnle_10m_shifted_logt.npz \
    --outdir artifacts/calibration_shifted10m_slice_96 \
    > /tmp/q_flag4u.log 2>&1
  echo "$(stamp) [flag4u] exit=$?"
else
  echo "$(stamp) [flag4u] SKIPPED (done/deadline)"
fi

# affine5 — the structural-fix candidate: 10M shifted-log + log-theta +
# COND-AFFINE (no tail-sharp), PT6 + tau-slice, 96x600. Run after flag4u so
# its result has a same-sampler unsharp baseline to difference against.
if [ ! -f artifacts/calibration_affine10m_slice_96/summary.json ] && have 10800; then
  echo "$(stamp) [affine5] cond-affine 10M SBC with PT6 + tau-slice"
  timeout 10800 python benchmarks/calibration_run.py \
    --sims 10000000 --datasets 96 --post-samples 600 --chains 4 --warmup 200 \
    --pt-replicas 6 --pt-beta-min 0.04 --censor-rt --rt-rep shifted_log \
    --log-theta --tau-slice --cond-affine \
    --model mnle_10m_shifted_logt_affine.npz \
    --outdir artifacts/calibration_affine10m_slice_96 \
    > /tmp/q_affine5.log 2>&1
  echo "$(stamp) [affine5] exit=$?"
else
  echo "$(stamp) [affine5] SKIPPED (done/deadline)"
fi

# resume5 — complete the round-4 sharp flagship artifact from its NUTS
# checkpoints (9/24 groups done): cheap completion of the 96-dataset
# evidence for the sharp arm once the primary experiments are in.
if [ ! -f artifacts/calibration_sharp10m_slice_96/summary.json ] && have 7200; then
  echo "$(stamp) [resume5] resume sharp flagship from checkpoints"
  timeout 7200 python benchmarks/calibration_run.py \
    --sims 10000000 --datasets 96 --post-samples 600 --chains 4 --warmup 200 \
    --pt-replicas 6 --pt-beta-min 0.04 --censor-rt --rt-rep shifted_log \
    --log-theta --tau-slice --tail-sharp-k 1.5 --reuse-model \
    --model mnle_10m_shifted_logt_sharp.npz \
    --outdir artifacts/calibration_sharp10m_slice_96 \
    > /tmp/q_resume5.log 2>&1
  echo "$(stamp) [resume5] exit=$?"
else
  echo "$(stamp) [resume5] SKIPPED (done/deadline)"
fi

# ens5 — deep-ensemble arm (round-3 VERDICT #3): K=3 members at 4M sims
# each with the best estimator config known at run time, mixture SBC.
if [ ! -f artifacts/calibration_ens3_96/summary.json ] && have 10800; then
  echo "$(stamp) [ens5] K=3 ensemble SBC 96x600 (PT6 + tau-slice)"
  timeout 10800 python benchmarks/calibration_run.py \
    --sims 4000000 --datasets 96 --post-samples 600 --chains 4 --warmup 200 \
    --pt-replicas 6 --pt-beta-min 0.04 --censor-rt --rt-rep shifted_log \
    --log-theta --tau-slice --ensemble 3 --model mnle_4m_shifted_ens.npz \
    --outdir artifacts/calibration_ens3_96 \
    > /tmp/q_ens5.log 2>&1
  echo "$(stamp) [ens5] exit=$?"
else
  echo "$(stamp) [ens5] SKIPPED (done/deadline)"
fi

if [ ! -f artifacts/hierarchical_coverage_pt_s8.json ] && have 2700; then
  echo "$(stamp) [hier4] 8 subjects x 40 trials coverage (mu power test)"
  timeout 2400 python benchmarks/hierarchical_coverage.py \
    --reps 2 --seed 21 --subjects 8 --trials 40 --max-depth 7 \
    --pt-replicas 6 --pt-beta-min 0.04 --batch-reps \
    --model mnle_1m_censor.npz \
    --out artifacts/hierarchical_coverage_pt_s8.json \
    > /tmp/q_hier4.log 2>&1
  echo "$(stamp) [hier4] exit=$?"
else
  echo "$(stamp) [hier4] SKIPPED (done/deadline)"
fi

if ! grep -q posterior_predictive artifacts/golden_parity.json 2>/dev/null; then
  if have 1800; then
    echo "$(stamp) [gold] golden parity + posterior-predictive check"
    timeout 1800 python benchmarks/golden_parity.py > /tmp/q_gold.log 2>&1
    echo "$(stamp) [gold] exit=$?"
  fi
else
  echo "$(stamp) [gold] SKIPPED (done)"
fi

if [ ! -f artifacts/mnle_kernel_profile.json ] && have 900; then
  echo "$(stamp) [prof] fused MNLE kernel MXU/VPU profile"
  timeout 900 python benchmarks/mnle_kernel_profile.py --quick \
    > /tmp/q_prof.log 2>&1
  echo "$(stamp) [prof] exit=$?"
else
  echo "$(stamp) [prof] SKIPPED (done/deadline)"
fi

# thrfl — flagship-shape ESS/s rows (VERDICT #8): resume log carries the 12
# round-3 rows, so only the two new flagship-c4x6pt rows are measured.
if have 1500; then
  echo "$(stamp) [thrfl] flagship-shape throughput rows"
  timeout 1500 python benchmarks/mcmc_throughput.py \
    --resume-log artifacts/mcmc_throughput_r3_rows.jsonl \
    > /tmp/q_thrfl.log 2>&1
  echo "$(stamp) [thrfl] exit=$?"
else
  echo "$(stamp) [thrfl] SKIPPED (deadline)"
fi
echo "$(stamp) queue done ($(remaining)s to deadline)"
