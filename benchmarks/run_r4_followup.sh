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
#   hier4 — 8-subject x 40-trial hierarchical coverage (VERDICT #4): the
#           discriminating estimator-bias power test, now on the fused
#           hierarchical potential (commit 2958d93).
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

if have 1500; then
  echo "$(stamp) [gold] golden parity + posterior-predictive check"
  timeout 1800 python benchmarks/golden_parity.py \
    > /tmp/q_gold.log 2>&1
  echo "$(stamp) [gold] exit=$?"
else
  echo "$(stamp) [gold] SKIPPED (deadline)"
fi

if have 700; then
  echo "$(stamp) [prof] fused MNLE kernel MXU/VPU profile"
  timeout 900 python benchmarks/mnle_kernel_profile.py --quick \
    > /tmp/q_prof.log 2>&1
  echo "$(stamp) [prof] exit=$?"
else
  echo "$(stamp) [prof] SKIPPED (deadline)"
fi

if have 2400; then
  echo "$(stamp) [hier4] 8 subjects x 40 trials coverage (mu power test)"
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
echo "$(stamp) follow-up queue done ($(remaining)s to deadline)"
