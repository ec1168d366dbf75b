#!/bin/bash
# Round-3 TPU experiment queue. ONE TPU process at a time (CLAUDE.md);
# everything here runs sequentially. Each stage logs to /tmp/q_<name>.log
# and failures do not block later stages.
#
# Stages (VERDICT round-2 items in parens):
#   wait  — poll until the axon TPU answers (it has been down since ~23:28)
#   e4b   — 1M shifted_log+log-theta SBC 96x600, PT6, soft onset barrier (#1)
#   flag  — flagship: 10M shifted_log+log-theta train + SBC 96x600, PT6 (#1)
#   thr   — MCMC throughput sweep with ESS/s headline (#5)
#   roof  — VPU roofline + profiler trace (#8)
#   hier  — hierarchical hyperparameter coverage (#6)
set -u
cd /root/repo

stamp() { date +%H:%M:%S; }

echo "$(stamp) waiting for TPU..."
until timeout 300 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
  echo "$(stamp) tpu still down"
  sleep 120
done
echo "$(stamp) TPU BACK — starting queue"

echo "$(stamp) [e4b] 1M shifted_log+logt SBC (reuse model)"
rm -rf artifacts/calibration_shifted_logt_96
timeout 10800 python benchmarks/calibration_run.py \
  --sims 1000000 --datasets 96 --post-samples 600 --chains 4 --warmup 200 \
  --pt-replicas 6 --pt-beta-min 0.04 --censor-rt --rt-rep shifted_log \
  --log-theta --reuse-model --model mnle_1m_shifted_logt.npz \
  --outdir artifacts/calibration_shifted_logt_96 \
  > /tmp/q_e4b.log 2>&1
echo "$(stamp) [e4b] exit=$?"

echo "$(stamp) [flag] 10M shifted_log+logt train + SBC"
timeout 14400 python benchmarks/calibration_run.py \
  --sims 10000000 --datasets 96 --post-samples 600 --chains 4 --warmup 200 \
  --pt-replicas 6 --pt-beta-min 0.04 --censor-rt --rt-rep shifted_log \
  --log-theta --model mnle_10m_shifted_logt.npz \
  --outdir artifacts/calibration_shifted10m_96 \
  > /tmp/q_flag.log 2>&1
echo "$(stamp) [flag] exit=$?"

# Contingency: if the flagship 10M shifted_log run fails rank
# uniformity on any dim, retry with a 2-member deep ensemble — ensembles
# halve the idiosyncratic component of the rank variance (BENCH_NOTES
# round-3 "Decomposing the estimator bias").
flag_min_p=$(python - <<'EOF'
import json, pathlib
f = pathlib.Path("artifacts/calibration_shifted10m_96/summary.json")
try:
    s = json.loads(f.read_text())
    print(min(s["ks_pvalues"] + s["chi2_pvalues"]))
except Exception:
    print("nan")
EOF
)
if python -c "import sys; sys.exit(0 if not (float('$flag_min_p') > 0.01) else 1)"; then
  echo "$(stamp) [ens] flagship min p=$flag_min_p <= 0.01 — 2-member 10M ensemble retry"
  timeout 18000 python benchmarks/calibration_run.py \
    --sims 10000000 --datasets 96 --post-samples 600 --chains 4 --warmup 200 \
    --pt-replicas 6 --pt-beta-min 0.04 --censor-rt --rt-rep shifted_log \
    --log-theta --ensemble 2 --model mnle_10m_shifted_logt_ens.npz \
    --outdir artifacts/calibration_shifted10m_ens_96 \
    > /tmp/q_ens.log 2>&1
  echo "$(stamp) [ens] exit=$?"
else
  echo "$(stamp) [ens] flagship min p=$flag_min_p > 0.01 — ensemble retry not needed"
fi


echo "$(stamp) [roof] roofline + trace"
timeout 3600 python benchmarks/roofline.py --trace artifacts/trace_r3 \
  > /tmp/q_roof.log 2>&1
echo "$(stamp) [roof] exit=$?"

echo "$(stamp) [thr] MCMC throughput (ESS/s headline)"
timeout 7200 python benchmarks/mcmc_throughput.py --model mnle_10m_censor.npz \
  > /tmp/q_thr.log 2>&1
echo "$(stamp) [thr] exit=$?"

# hier stage removed: hierarchical coverage runs CPU-side (the benchmark
# honors SDM_PLATFORM=cpu), freeing ~3h of TPU time for the SBC queue.

echo "$(stamp) [pulsept] pulse rep under the hot PT ladder (VERDICT #4)"
timeout 10800 python benchmarks/calibration_run.py \
  --sims 1000000 --datasets 96 --post-samples 600 --chains 4 --warmup 200 \
  --pt-replicas 6 --pt-beta-min 0.04 --rt-rep pulse --grid-anchor absolute \
  --reuse-model --model mnle_1m_pulseabs.npz \
  --outdir artifacts/calibration_pulseabs_pt6_96 \
  > /tmp/q_pulsept.log 2>&1
echo "$(stamp) [pulsept] exit=$?"

echo "$(stamp) queue done"
