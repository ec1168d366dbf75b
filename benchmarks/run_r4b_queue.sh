#!/bin/bash
# Round-4 evening TPU queue (staged mid-round; ONE TPU process at a time,
# CLAUDE.md). Context: flag4 (10M shifted_log + PT6 + tau-slice) ran to
# completion; a0/lam/v/B uniform, tau still fails one-sidedly (KS ~1e-5 at
# 96 datasets), ~16/96 datasets unmixed. The decomposition:
#   - remed: re-run the SAME flag4 command — all 24 groups reload from
#     checkpoints, then the new mixing-gate pass (run_config.SBC_REMEDIATE)
#     re-runs flagged datasets at 2x warmup + hotter ladder and writes
#     pooled + mixed-only p-values (round-3 VERDICT #2).
#   - sharp: the round-4 tau attack — left-tail sharpening
#     (MNLE_TAIL_SHARP_K: doubly-exponential near-onset decay; the measured
#     left-tail excess is 8.6x nominal, artifacts/onset_density_check.json).
#     Train 10M + validate the tail with onset_density_check + SBC 96x600.
#   - hier-fused: re-measure the round-3 pt_a coverage config with the
#     fused hierarchical potential (VERDICT #5: >= 2x wall) then the S=8x40
#     power test (VERDICT #4).
#   - tput/profile/parity: flagship-shape throughput rows (VERDICT #8),
#     MNLE kernel MXU/VPU decomposition (VERDICT #9), golden-parity PPC
#     (VERDICT #7).
#   - ens: ensemble row at 96-dataset power (VERDICT #3), K=3 x 1M censored.
set -u
cd /root/repo
export MODEL_DIR="${MODEL_DIR:-/root/repo/artifacts/models}"
DEADLINE=${DEADLINE:-$(( $(date +%s) + 21600 ))}
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

if have 3600; then
  echo "$(stamp) [remed] flag4 resume -> remediation pass + mixed-only stats"
  timeout 5400 python benchmarks/calibration_run.py \
    --sims 10000000 --datasets 96 --post-samples 600 --chains 4 --warmup 200 \
    --pt-replicas 6 --pt-beta-min 0.04 --censor-rt --rt-rep shifted_log \
    --log-theta --tau-slice --reuse-model --model mnle_10m_shifted_logt.npz \
    --outdir artifacts/calibration_shifted10m_slice_96 \
    > /tmp/q_remed.log 2>&1
  echo "$(stamp) [remed] exit=$?"
fi

if have 3600; then
  echo "$(stamp) [sharp-train] 10M shifted_log + tail-sharp model"
  timeout 5400 python benchmarks/calibration_run.py \
    --sims 10000000 --datasets 8 --post-samples 40 --chains 2 --warmup 40 \
    --censor-rt --rt-rep shifted_log --log-theta --tail-sharp-k 1.5 \
    --model mnle_10m_shifted_sharp.npz \
    --outdir artifacts/calibration_sharp_smoke \
    > /tmp/q_sharp_train.log 2>&1
  echo "$(stamp) [sharp-train] exit=$?"
  echo "$(stamp) [sharp-onset] left-tail check of the sharp model"
  timeout 1800 python benchmarks/onset_density_check.py \
    --models mnle_10m_shifted_sharp.npz,mnle_10m_shifted_logt.npz \
    --out artifacts/onset_density_check_sharp.json \
    > /tmp/q_sharp_onset.log 2>&1
  echo "$(stamp) [sharp-onset] exit=$?"
fi

if have 7200; then
  echo "$(stamp) [sharp-sbc] tail-sharp flagship SBC 96x600"
  timeout 7200 python benchmarks/calibration_run.py \
    --sims 10000000 --datasets 96 --post-samples 600 --chains 4 --warmup 200 \
    --pt-replicas 6 --pt-beta-min 0.04 --censor-rt --rt-rep shifted_log \
    --log-theta --tau-slice --tail-sharp-k 1.5 \
    --reuse-model --model mnle_10m_shifted_sharp.npz \
    --outdir artifacts/calibration_sharp10m_96 \
    > /tmp/q_sharp_sbc.log 2>&1
  echo "$(stamp) [sharp-sbc] exit=$?"
fi

if have 2400; then
  echo "$(stamp) [hier-fused] pt_a config re-measure (fused potential, VERDICT #5)"
  timeout 2400 python benchmarks/hierarchical_coverage.py \
    --reps 4 --seed 11 --subjects 4 --trials 20 --max-depth 8 \
    --pt-replicas 6 --pt-beta-min 0.04 --batch-reps \
    --model mnle_1m_censor.npz \
    --out artifacts/hierarchical_coverage_pt_fused.json \
    > /tmp/q_hier_fused.log 2>&1
  echo "$(stamp) [hier-fused] exit=$?"
fi

if have 2700; then
  echo "$(stamp) [hier4] 8 subjects x 40 trials coverage (mu power test)"
  timeout 2400 python benchmarks/hierarchical_coverage.py \
    --reps 2 --seed 21 --subjects 8 --trials 40 --max-depth 7 \
    --pt-replicas 6 --pt-beta-min 0.04 --batch-reps \
    --model mnle_1m_censor.npz \
    --out artifacts/hierarchical_coverage_pt_s8.json \
    > /tmp/q_hier4.log 2>&1
  echo "$(stamp) [hier4] exit=$?"
fi

if have 1800; then
  echo "$(stamp) [tput] flagship-shape throughput rows (VERDICT #8)"
  timeout 1800 python benchmarks/mcmc_throughput.py \
    --resume-log /tmp/mcmc_throughput_resume.log \
    > /tmp/q_tput.log 2>&1
  echo "$(stamp) [tput] exit=$?"
fi

if have 1500; then
  echo "$(stamp) [profile] MNLE kernel MXU/VPU decomposition (VERDICT #9)"
  timeout 1500 python benchmarks/mnle_kernel_profile.py \
    > /tmp/q_profile.log 2>&1
  echo "$(stamp) [profile] exit=$?"
fi

if have 2400; then
  echo "$(stamp) [parity] golden parity + posterior-predictive check (VERDICT #7)"
  timeout 2400 python benchmarks/golden_parity.py \
    > /tmp/q_parity.log 2>&1
  echo "$(stamp) [parity] exit=$?"
fi

if have 9000; then
  echo "$(stamp) [ens] K=3 x 1M censored ensemble SBC 96x600 (VERDICT #3)"
  timeout 9000 python benchmarks/calibration_run.py \
    --sims 1000000 --datasets 96 --post-samples 600 --chains 4 --warmup 200 \
    --pt-replicas 6 --pt-beta-min 0.04 --censor-rt --log-theta \
    --ensemble 3 --model mnle_1m_ens.npz \
    --outdir artifacts/calibration_ens1m_96 \
    > /tmp/q_ens.log 2>&1
  echo "$(stamp) [ens] exit=$?"
fi
echo "$(stamp) queue done ($(remaining)s to deadline)"
