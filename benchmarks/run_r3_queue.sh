#!/bin/bash
# Round-3 TPU experiment queue. ONE TPU process at a time (CLAUDE.md);
# everything here runs sequentially. Each stage logs to /tmp/q_<name>.log
# and failures do not block later stages.
#
# Time-aware: stages are ordered by VERDICT priority and each stage only
# starts if it can finish before $DEADLINE (epoch seconds; default now+12h).
# The TPU tunnel was down for 7+ hours this round — when it returns late,
# the queue must spend the remaining chip time on the top items
# (shifted-log SBC → flagship 10M → roofline → ESS/s → pulse+PT) and skip
# the tail rather than truncating the flagship mid-run.
#
# Stages (VERDICT round-2 items in parens). Order: flagship FIRST — it is
# the only run that can pass all-5 SBC at 96 datasets, the chip has gone
# down mid-round twice, and the CPU hedge (calibration_shifted_cpu16)
# already answers the 1M-shifted question at 16-dataset power:
#   wait  — poll until the axon TPU answers
#   flag  — flagship: 10M shifted_log+log-theta train + SBC 96x600, PT6 (#1)
#   ens   — contingency: 2-member 10M ensemble if flag fails uniformity (#1)
#   roof  — VPU roofline + profiler trace (#8)
#   thr   — MCMC throughput sweep with ESS/s headline (#5)
#   e4b   — 1M shifted_log+log-theta SBC 96x600, PT6, soft onset barrier (#1)
#   hier  — hierarchical hyperparameter coverage with PT replicas (#6;
#           moved onto the TPU: CPU reps cost ~70 min each on the 1-core
#           host and plain NUTS shows worst-rep R-hat ~2 that PT fixes)
#   pulsept — pulse rep under the hot PT ladder (#4)
# (e4b demoted below roof/thr 2026-08-18: reuses a trained 1M model whose
# v-shrinkage failure mode is already measured; not a candidate headline.)
set -u
cd /root/repo

# Trained models live in the repo so they survive host restarts (the
# $HOME/models copies were wiped by one mid-round; artifacts/ persisted).
export MODEL_DIR="${MODEL_DIR:-/root/repo/artifacts/models}"

DEADLINE=${DEADLINE:-$(( $(date +%s) + 43200 ))}

stamp() { date +%H:%M:%S; }
remaining() { echo $(( DEADLINE - $(date +%s) )); }
# have <seconds> — true if at least that much time remains before DEADLINE.
have() { [ "$(remaining)" -ge "$1" ]; }

echo "$(stamp) waiting for TPU... (deadline in $(remaining)s)"
until timeout 300 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
  echo "$(stamp) tpu still down"
  have 1200 || { echo "$(stamp) deadline reached while waiting; abort"; exit 1; }
  sleep 120
done
echo "$(stamp) TPU BACK — starting queue ($(remaining)s to deadline)"

run_flag() {
  # $@: extra flags (retry passes --reuse-model; SBC nuts_ckpt disk-resumes
  # because run_sbc's run_id hashes only (key, shapes), not params, and the
  # model is saved before SBC starts).
  timeout 7800 python benchmarks/calibration_run.py \
    --sims 10000000 --datasets 96 --post-samples 600 --chains 4 --warmup 200 \
    --pt-replicas 6 --pt-beta-min 0.04 --censor-rt --rt-rep shifted_log \
    --log-theta --model mnle_10m_shifted_logt.npz \
    --outdir artifacts/calibration_shifted10m_96 "$@" \
    >> /tmp/q_flag.log 2>&1
}
if have 7800; then
  echo "$(stamp) [flag] 10M shifted_log+logt train + SBC"
  run_flag
  rc=$?
  echo "$(stamp) [flag] exit=$rc"
  if [ "$rc" -ne 0 ] && [ -f "${MODEL_DIR:-$HOME/models}/mnle_10m_shifted_logt.npz" ] && have 5400; then
    echo "$(stamp) [flag] retrying with --reuse-model (tunnel drop resilience)"
    until timeout 300 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
      have 1800 || break; sleep 120
    done
    run_flag --reuse-model
    echo "$(stamp) [flag] retry exit=$?"
  fi
else
  echo "$(stamp) [flag] SKIPPED (deadline)"
fi

# Contingency: if the flagship 10M shifted_log run fails rank uniformity on
# any dim, retry with a 2-member deep ensemble — ensembles halve the
# idiosyncratic component of the rank variance (BENCH_NOTES round-3
# "Decomposing the estimator bias").
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
  if have 9600; then
    echo "$(stamp) [ens] flagship min p=$flag_min_p <= 0.01 — 2-member 10M ensemble retry"
    timeout 9600 python benchmarks/calibration_run.py \
      --sims 10000000 --datasets 96 --post-samples 600 --chains 4 --warmup 200 \
      --pt-replicas 6 --pt-beta-min 0.04 --censor-rt --rt-rep shifted_log \
      --log-theta --ensemble 2 --model mnle_10m_shifted_logt_ens.npz \
      --outdir artifacts/calibration_shifted10m_ens_96 \
      > /tmp/q_ens.log 2>&1
    echo "$(stamp) [ens] exit=$?"
  else
    echo "$(stamp) [ens] needed (min p=$flag_min_p) but SKIPPED (deadline)"
  fi
else
  echo "$(stamp) [ens] flagship min p=$flag_min_p > 0.01 — ensemble retry not needed"
fi

if have 2400; then
  echo "$(stamp) [roof] roofline + trace"
  timeout 2400 python benchmarks/roofline.py --trace artifacts/trace_r3 \
    > /tmp/q_roof.log 2>&1
  echo "$(stamp) [roof] exit=$?"
else
  echo "$(stamp) [roof] SKIPPED (deadline)"
fi

if have 5400; then
  # Pinned to mnle_10m.npz: the 5 rows already measured this round
  # (artifacts/mcmc_throughput_r3_partial.jsonl.log) used it, and resumed
  # rows are only valid against the same potential.
  echo "$(stamp) [thr] MCMC throughput (ESS/s headline; model=mnle_10m.npz, resume)"
  timeout 5400 python benchmarks/mcmc_throughput.py --model mnle_10m.npz \
    --resume-log artifacts/mcmc_throughput_r3_partial.jsonl.log \
    > /tmp/q_thr2.log 2>&1
  echo "$(stamp) [thr] exit=$?"
else
  echo "$(stamp) [thr] SKIPPED (deadline)"
fi

if have 5400; then
  # Trains fresh: the round's earlier mnle_1m_shifted_logt.npz lived in
  # $HOME/models and was lost to the host restart (1M train is ~4 min).
  echo "$(stamp) [e4b] 1M shifted_log+logt train + SBC"
  rm -rf artifacts/calibration_shifted_logt_96
  timeout 5400 python benchmarks/calibration_run.py \
    --sims 1000000 --datasets 96 --post-samples 600 --chains 4 --warmup 200 \
    --pt-replicas 6 --pt-beta-min 0.04 --censor-rt --rt-rep shifted_log \
    --log-theta --model mnle_1m_shifted_logt.npz \
    --outdir artifacts/calibration_shifted_logt_96 \
    > /tmp/q_e4b.log 2>&1
  echo "$(stamp) [e4b] exit=$?"
else
  echo "$(stamp) [e4b] SKIPPED (deadline)"
fi

if have 5400; then
  # Best estimator available: the flagship shifted-log 10M (exact rt=t_nd
  # onset, calibrated tau) if flag trained it, else 10M censor, else 1M.
  HIER_MODEL=mnle_1m_censor.npz
  for m in mnle_10m_censor.npz mnle_10m_shifted_logt.npz; do
    [ -f "${MODEL_DIR:-$HOME/models}/$m" ] && HIER_MODEL=$m
  done
  echo "$(stamp) [hier] hierarchical coverage with PT on TPU (VERDICT #6; model=$HIER_MODEL)"
  timeout 5400 python benchmarks/hierarchical_coverage.py \
    --reps 10 --seed 7 --max-depth 10 --pt-replicas 6 --pt-beta-min 0.04 \
    --batch-reps --model "$HIER_MODEL" \
    --out artifacts/hierarchical_coverage_pt.json \
    > /tmp/q_hier.log 2>&1
  echo "$(stamp) [hier] exit=$?"
else
  echo "$(stamp) [hier] SKIPPED (deadline)"
fi

if have 5400; then
  echo "$(stamp) [pulsept] pulse rep under the hot PT ladder (VERDICT #4)"
  timeout 5400 python benchmarks/calibration_run.py \
    --sims 1000000 --datasets 96 --post-samples 600 --chains 4 --warmup 200 \
    --pt-replicas 6 --pt-beta-min 0.04 --rt-rep pulse --grid-anchor absolute \
    --reuse-model --model mnle_1m_pulseabs.npz \
    --outdir artifacts/calibration_pulseabs_pt6_96 \
    > /tmp/q_pulsept.log 2>&1
  echo "$(stamp) [pulsept] exit=$?"
else
  echo "$(stamp) [pulsept] SKIPPED (deadline)"
fi

echo "$(stamp) queue done ($(remaining)s to deadline)"
