#!/bin/bash
# Round-5 TPU experiment queue, staged at the end of round 4. ONE TPU
# process at a time (CLAUDE.md). Stages skip themselves if their artifact
# already exists (so a round-4 followup that did run is not repeated).
#
# Context (round-4 findings, see BENCH_NOTES "Round 4"):
#   - The flagship sharp-10M SBC (artifacts/calibration_sharp10m_slice_96)
#     is the first run with PT6 + tau-slice + mixing gate on a shifted-log
#     model; its summary decides the branches below.
#   - onset_density_check_sharp.json: the remaining left-tail excess is
#     PER-CONDITION BULK misfit (e.g. 5.4% model mass in a dt bin where the
#     simulator has 0.1%), NOT below-data-edge mass (zero for both models).
#     A global fixed pre-transform cannot fix it; candidate round-5 levers
#     are (a) deep ensemble (averages independent member misfits), (b) more
#     conditional capacity (transforms/bins), (c) a conditional tail-weighted
#     objective. (a) is built and cheapest to test.
#   hier4 — 8 subjects x 40 trials coverage (round-3 VERDICT #4), squeezed
#     out of round 4's window; depth-7 envelope per the worker-crash finding.
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

TAU_FAILED=$(python - <<'EOF'
import json
try:
    s = json.load(open("artifacts/calibration_sharp10m_slice_96/summary.json"))
    print(1 if (s["ks_pvalues"][4] < 0.01 or s["chi2_pvalues"][4] < 0.01) else 0)
except Exception:
    print(1)
EOF
)

# ens5 — deep-ensemble flagship (round-3 VERDICT #3): train K=3 members at
# 4M sims each (the 4M-vs-10M single-model gap was small in round 2; 3x4M
# trains in ~3x8min) and run the 96x600 SBC with the mixture likelihood.
if [ "$TAU_FAILED" = "1" ] && [ ! -f artifacts/calibration_ens3_96/summary.json ] && have 10800; then
  echo "$(stamp) [ens5] K=3 ensemble SBC 96x600 (PT6 + tau-slice)"
  timeout 10800 python benchmarks/calibration_run.py \
    --sims 4000000 --datasets 96 --post-samples 600 --chains 4 --warmup 200 \
    --pt-replicas 6 --pt-beta-min 0.04 --censor-rt --rt-rep shifted_log \
    --log-theta --tau-slice --ensemble 3 --model mnle_4m_shifted_ens.npz \
    --outdir artifacts/calibration_ens3_96 \
    > /tmp/q_ens5.log 2>&1
  echo "$(stamp) [ens5] exit=$?"
else
  echo "$(stamp) [ens5] SKIPPED (tau_failed=$TAU_FAILED or done/deadline)"
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

if [ ! -f artifacts/golden_parity.json ] || ! grep -q posterior_predictive artifacts/golden_parity.json; then
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

if [ "$TAU_FAILED" = "1" ] && [ ! -f artifacts/likelihood_slope_tau.json ] && have 900; then
  echo "$(stamp) [tausl] tau likelihood-profile sweep"
  timeout 900 python benchmarks/likelihood_slope.py \
    --models mnle_10m_shifted_logt_sharp.npz mnle_10m_shifted_logt.npz \
    --dims 4 --datasets 4 --points 11 --reps 1024 \
    --out artifacts/likelihood_slope_tau.json \
    > /tmp/q_tausl.log 2>&1
  echo "$(stamp) [tausl] exit=$?"
else
  echo "$(stamp) [tausl] SKIPPED (tau_failed=$TAU_FAILED or done/deadline)"
fi

# thrfl — flagship-shape ESS/s rows (VERDICT #8 reconciliation), code shipped
# round 4 (mcmc_throughput.py flagship-c4x6pt rows) but never yet run.
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
