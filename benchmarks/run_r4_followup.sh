#!/bin/bash
# Round-4 follow-up TPU queue: fires automatically when the flagship SBC
# process (PID in /tmp/flag4.pid) exits. ONE TPU process at a time
# (CLAUDE.md), so every stage here strictly serializes behind the flagship.
# Stages, deadline-gated (priority order for the leftover round window):
#   gold  — golden_parity.py first full run of the posterior-predictive
#           check (round-3 VERDICT #7): decides which posterior (ours vs the
#           reference artifact) is faithful to the simulator.
#   prof  — mnle_kernel_profile.py (VERDICT #9): MXU/VPU split of the fused
#           MNLE kernel (rows/s vs transforms and vs hidden width).
#   tausl — CONDITIONAL on the flagship still failing tau: likelihood-profile
#           sweep along tau (likelihood_slope.py --dims 4) for the sharp and
#           unsharp 10M models — the direct argmax-offset measurement of the
#           estimator-level tau bias (same instrument that quantified v/B in
#           round 3, never yet pointed at the failing dimension).
# hier4 (8-subject coverage, 40 min) cannot fit in this round's window and
# is staged in benchmarks/run_r5_queue.sh instead.
set -u
cd /root/repo
export MODEL_DIR="${MODEL_DIR:-/root/repo/artifacts/models}"
DEADLINE=${DEADLINE:?set DEADLINE epoch seconds}
stamp() { date +%H:%M:%S; }
remaining() { echo $(( DEADLINE - $(date +%s) )); }
have() { [ "$(remaining)" -ge "$1" ]; }

FLAG_PID=$(cat /tmp/flag4.pid 2>/dev/null || echo "")
if [ -n "$FLAG_PID" ]; then
  echo "$(stamp) waiting for flagship pid $FLAG_PID to exit..."
  while kill -0 "$FLAG_PID" 2>/dev/null; do sleep 30; done
fi
echo "$(stamp) flagship done — follow-up queue starts ($(remaining)s left)"

TAU_FAILED=$(python - <<'EOF'
import json
try:
    s = json.load(open("artifacts/calibration_sharp10m_slice_96/summary.json"))
    ks = s["ks_pvalues"]; chi = s["chi2_pvalues"]
    print(1 if (ks[4] < 0.01 or chi[4] < 0.01) else 0)
except Exception:
    print(1)  # no summary -> assume the question is still open
EOF
)
if [ "$TAU_FAILED" = "1" ] && have 500; then
  echo "$(stamp) [tausl] tau likelihood-profile sweep (sharp vs unsharp)"
  timeout 800 python benchmarks/likelihood_slope.py \
    --models mnle_10m_shifted_logt_sharp.npz mnle_10m_shifted_logt.npz \
    --dims 4 --datasets 4 --points 11 --reps 1024 \
    --out artifacts/likelihood_slope_tau.json \
    > /tmp/q_tausl.log 2>&1
  echo "$(stamp) [tausl] exit=$?"
else
  echo "$(stamp) [tausl] SKIPPED (tau_failed=$TAU_FAILED, $(remaining)s left)"
fi

if have 600; then
  echo "$(stamp) [prof] fused MNLE kernel MXU/VPU profile"
  timeout 700 python benchmarks/mnle_kernel_profile.py --quick \
    > /tmp/q_prof.log 2>&1
  echo "$(stamp) [prof] exit=$?"
else
  echo "$(stamp) [prof] SKIPPED (deadline)"
fi

if have 1200; then
  echo "$(stamp) [gold] golden parity + posterior-predictive check"
  timeout 1500 python benchmarks/golden_parity.py \
    > /tmp/q_gold.log 2>&1
  echo "$(stamp) [gold] exit=$?"
else
  echo "$(stamp) [gold] SKIPPED (deadline)"
fi

# thrfl — flagship-shape ESS/s rows (VERDICT #8): resume log carries the 12
# round-3 rows, so only the two new flagship-c4x6pt rows are measured.
if have 800; then
  echo "$(stamp) [thrfl] flagship-shape throughput rows"
  timeout 1000 python benchmarks/mcmc_throughput.py \
    --resume-log artifacts/mcmc_throughput_r3_rows.jsonl \
    > /tmp/q_thrfl.log 2>&1
  echo "$(stamp) [thrfl] exit=$?"
else
  echo "$(stamp) [thrfl] SKIPPED (deadline)"
fi
echo "$(stamp) follow-up queue done ($(remaining)s to deadline)"
