"""Roofline / utilization analysis for the two Pallas kernels (round-2
VERDICT item 4 / round-1 item 9: "is it actually fast or just fast-enough").

Strategy: the DDM simulator is a VPU (element-wise) workload — the MXU and
HBM roofs are irrelevant (the kernel streams (theta, stimulus) once and
writes 8 bytes/trial; at measured throughput that is <1% of HBM bandwidth).
The binding resource is VPU issue slots. Rather than trust a datasheet
number for the VPU peak, measure ACHIEVABLE ceilings with two Pallas
microkernels on the same (8, 128) tile layout the simulator uses:

* ``fma``: K chained multiply-adds per element resident in VMEM — the
  achievable elementwise-FLOP ceiling.
* ``transcendental``: K chained exp/log-style ops — the achievable
  special-function ceiling (these are multi-slot on the VPU).

Then count the simulator's per-trial-step op mix from the kernel source
(ops/ddm_pallas.py): amortized over a steps_per_pulse=10 chunk with paired
Box-Muller draws,

  per trial-step:  ~18 FMA-class ops (leak+diffusion update ~5, bound
                   compares/selects/masks ~11, amortized Box-Muller integer
                   ops, scalings ~4.5 per step over a shared pair, minus
                   overlap)  +  2 transcendental-class ops (0.5 log +
                   0.5 sqrt + 0.5 cos + 0.5 sin per step)

and convert measured trial-steps/s into VPU-slot demand vs the measured
ceilings. The MNLE fused log-prob kernel (ops/mnle_pallas.py) is measured
as rows/s with an analytic FLOP count per row (trunk matmuls dominate).

Writes artifacts/roofline.json; run with --trace DIR to also capture a
jax.profiler trace of one bench pass (the trace artifact round 1 asked
for).

Usage: python benchmarks/roofline.py [--trace artifacts/trace_r3]
"""

from __future__ import annotations

import argparse
import json
import math
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from sbi_for_diffusion_models_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def _time(fn, *args, reps=5):
    """Median wall time; host-transfer sync (block_until_ready is unreliable
    on the axon tunnel, CLAUDE.md)."""
    out = fn(*args)
    float(np.asarray(jax.tree.leaves(out)[0]).sum())  # compile + settle
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        float(np.asarray(jax.tree.leaves(out)[0]).sum())
        ts.append(time.time() - t0)
    return float(np.median(ts))


def vpu_ceiling(kind: str, *, R=256, G=64, K_lo=1 << 14, K_hi=1 << 17, reps=5):
    """Achievable VPU throughput (ops/s) for chained elementwise work on the
    simulator's tile layout: grid G over (R, 128) VMEM tiles, K serial ops
    per element (8-op unrolled ``fori_loop`` body — serial chaining defeats
    fusion-into-nothing).

    Dispatch through the axon tunnel costs O(100 ms) per call, which at the
    original K=512 was ~1000x the device time and made the "ceiling" absurdly
    low (the round-3 first cut printed 0.00 Tops/s and a 12545% utilization).
    Fix: time the SAME kernel at two chain lengths and difference them —
    ops/s = G*R*128*(K_hi-K_lo) / (wall_hi - wall_lo) — so the constant
    dispatch/transfer overhead cancels and only on-device issue rate remains.
    """

    def make(K):
        def body8(x):
            if kind == "fma":
                c = jnp.float32(1.0000001)
                d = jnp.float32(1e-7)
                for _ in range(8):
                    x = x * c + d
            else:  # transcendental mix: 4 special + 4 cheap ops per 8 slots
                x = jnp.exp(x * jnp.float32(1e-3))
                x = jnp.log(x + jnp.float32(1.5))
                x = jnp.sqrt(x * x + jnp.float32(0.25))
                x = jnp.sin(x)
                x = x * jnp.float32(1.0001) + jnp.float32(1e-6)
                x = jnp.maximum(x, jnp.float32(-10.0))
                x = jnp.minimum(x, jnp.float32(10.0))
                x = x + jnp.float32(1e-6)
            return x

        def kernel(x_ref, o_ref):
            o_ref[0] = jax.lax.fori_loop(
                0, K // 8, lambda i, x: body8(x), x_ref[0]
            )

        return jax.jit(
            lambda x: pl.pallas_call(
                kernel,
                grid=(G,),
                in_specs=[pl.BlockSpec((1, R, 128), lambda g: (g, 0, 0))],
                out_specs=pl.BlockSpec((1, R, 128), lambda g: (g, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((G, R, 128), jnp.float32),
            )(x)
        )

    x = jnp.ones((G, R, 128), jnp.float32) * 0.5
    wall_lo = _time(make(K_lo), x, reps=reps)
    wall_hi = _time(make(K_hi), x, reps=reps)
    dt = wall_hi - wall_lo
    if dt <= 0:  # noise swamped the difference; report the raw upper bound
        return G * R * 128 * K_hi / wall_hi, wall_hi
    return G * R * 128 * (K_hi - K_lo) / dt, wall_hi


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", type=str, default=None)
    ap.add_argument("--batch", type=int, default=524288)
    ap.add_argument("--out", type=str, default="artifacts/roofline.json")
    args = ap.parse_args()

    from sbi_for_diffusion_models_tpu.models.rt_choice_model import (
        generate_pulse_matrix,
        n_pulses_max_from_schedule,
        pulse_schedule,
    )
    from sbi_for_diffusion_models_tpu.ops.ddm_pallas import ddm_rt_choice_pallas

    report = {"backend": jax.default_backend()}

    # --- achievable VPU ceilings -----------------------------------------
    fma_ops, fma_wall = vpu_ceiling("fma")
    tra_ops, tra_wall = vpu_ceiling("transcendental")
    report["vpu_fma_ops_per_s"] = fma_ops
    report["vpu_transcendental_mix_ops_per_s"] = tra_ops
    print(f"[roofline] VPU FMA ceiling: {fma_ops/1e12:.2f} Tops/s "
          f"(wall {fma_wall*1e3:.1f} ms)")
    print(f"[roofline] VPU transcendental-mix ceiling: {tra_ops/1e12:.2f} "
          f"Tops/s (wall {tra_wall*1e3:.1f} ms)")

    # --- DDM simulator kernel --------------------------------------------
    n_max, spp = pulse_schedule()
    P = n_pulses_max_from_schedule(n_max, spp)
    N = args.batch
    theta = jnp.tile(
        jnp.array([[0.5, 0.1, 1.0, 30.0, 0.1]], jnp.float32), (N, 1)
    )  # high bound -> few early exits -> near-worst-case steps/trial
    pulses = generate_pulse_matrix(jax.random.key(0), N, P)
    sim = jax.jit(partial(ddm_rt_choice_pallas, n_max=n_max,
                          steps_per_pulse=spp))

    def run(theta, pulses):
        return sim(theta, pulses, jax.random.key(1))

    wall = _time(run, theta, pulses)
    # The kernel early-exits per tile; with B=30 most trials run all
    # n_max steps. Count executed steps pessimistically as n_max.
    steps = N * n_max
    tsps = steps / wall
    report["sim_batch"] = N
    report["sim_trial_steps_per_s"] = tsps
    # Op mix per trial-step (see module docstring): ~18 FMA-class + 2
    # transcendental-class VPU ops.
    fma_frac = 18 * tsps / fma_ops
    tra_frac = 2 * tsps / tra_ops
    util = fma_frac + tra_frac  # fraction of serial VPU issue capacity
    report["sim_ops_per_step"] = {"fma_class": 18, "transcendental_class": 2}
    report["sim_vpu_utilization_est"] = util
    # HBM traffic: read 5*4 (theta) + P (int8-packed? stored f32 = P*4)
    # bytes, write 2*4 bytes per trial.
    bytes_per_trial = 5 * 4 + P * 4 + 2 * 4
    hbm_gbps = N * bytes_per_trial / wall / 1e9
    report["sim_hbm_gb_per_s"] = hbm_gbps
    print(f"[roofline] sim: {tsps:.3e} trial-steps/s; est VPU utilization "
          f"{util*100:.0f}% of measured serial ceiling; HBM {hbm_gbps:.1f} "
          f"GB/s (<1% of ~819 GB/s peak -> compute-bound, as designed)")

    # --- MNLE fused log-prob kernel --------------------------------------
    try:
        from sbi_for_diffusion_models_tpu.mnle import load_model

        est = load_model("mnle_1m_censor.npz")
        rows = 65536
        D = est.cond_mean.shape[0]
        cond = jnp.zeros((rows, D), jnp.float32) + est.cond_mean
        x = jnp.concatenate(
            [jnp.full((rows, 1), 1.0), jnp.zeros((rows, 1))], axis=-1
        )
        lp_fn = est.dispatch_log_prob("pallas")
        f = jax.jit(lambda x, c: lp_fn(x, c))
        wall = _time(f, x, cond)
        rows_per_s = rows / wall
        # FLOPs/row: trunk (depth d, width h) matmuls 2*(D*h + (d-1)*h*h)
        # + flow transforms (num_transforms * ~(h*h + bins terms)). Count
        # the dense mat-vecs, which dominate.
        h = est.cfg.hidden_features
        d = est.cfg.trunk_depth
        T = est.cfg.num_transforms
        nb = est.cfg.num_bins
        flops_row = 2 * (D * h + max(d - 1, 0) * h * h) + T * (
            2 * h * (3 * nb + 1) + 12 * nb
        )
        report["mnle_rows_per_s"] = rows_per_s
        report["mnle_flops_per_row_est"] = flops_row
        report["mnle_gflops_per_s"] = rows_per_s * flops_row / 1e9
        print(f"[roofline] mnle-fused: {rows_per_s:.3e} rows/s "
              f"(~{rows_per_s*flops_row/1e12:.2f} TFLOP/s dense-equivalent)")
    except FileNotFoundError:
        print("[roofline] no saved MNLE model; skipping fused-kernel row")

    if args.trace:
        # Profiler capture through the axon tunnel is untested — never let a
        # trace failure discard the measured roofline numbers above.
        try:
            with jax.profiler.trace(args.trace):
                _ = run(theta, pulses)
                float(np.asarray(_).sum())
            report["trace_dir"] = args.trace
            print(f"[roofline] trace captured -> {args.trace}")
        except Exception as e:  # noqa: BLE001
            report["trace_error"] = f"{type(e).__name__}: {e}"
            print(f"[roofline] trace capture failed: {e}")

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(report, indent=2))
    print(f"[roofline] -> {out}")


if __name__ == "__main__":
    main()
