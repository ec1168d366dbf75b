"""Decompose the fused MNLE log-prob kernel's cost: MXU (trunk matmuls)
vs VPU (spline chain) — round-3 VERDICT #9.

The round-3 roofline put the fused kernel at 465 GFLOP/s dense-equivalent
(1.9e6 rows/s), single-digit percent of a v5e's matmul peak, and asked
whether the trunk matmuls hit the MXU or fall to the VPU. This benchmark
answers it by MEASUREMENT instead of attribution: rows/s of the
value-and-grad path (the NUTS hot loop) across synthetic estimators that
vary one architecture axis at a time.

- num_transforms in {2, 5, 10}: the spline chain is sequential per-row
  VPU work (knot prep softmaxes/softplus, one compare sweep, six masked
  lookups, RQ arithmetic), so wall per row should be ~ affine in T. The
  intercept at T=0 is the trunk+heads (matmul) share.
- hidden in {128, 256} at fixed T: matmul FLOPs scale ~4x (hidden^2 terms
  dominate); if wall is insensitive, the matmuls are nowhere near the
  bottleneck (MXU underutilized but irrelevant), and tile restructuring
  cannot buy throughput.
- batch in {4k, 64k}: dispatch/latency floor vs steady-state throughput.

Writes artifacts/mnle_kernel_profile.json with a per-config table and the
derived spline/trunk share split. The optimization shipped with this
benchmark (nets/spline._bin_onehot: one compare sweep + weighted sums
replacing six iota/int-compare/select lookups per transform) is measured
by the same harness — compare rows_per_s against roofline.json's
mnle_fused_rows_per_s.

Usage: python benchmarks/mnle_kernel_profile.py [--quick]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from sbi_for_diffusion_models_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    p.add_argument("--out", type=str,
                   default="artifacts/mnle_kernel_profile.json")
    args = p.parse_args()

    from sbi_for_diffusion_models_tpu.nets.mnle_net import (
        MNLEConfig,
        build_mnle,
    )

    cond_dim = 85  # 5 theta + 80 pulses (the production condition)

    def make_est(hidden, transforms, depth=2):
        return build_mnle(
            jax.random.key(0),
            MNLEConfig(
                condition_dim=cond_dim,
                hidden_features=hidden,
                num_transforms=transforms,
                num_bins=24,
                trunk_depth=depth,
            ),
        )

    def measure(est, n_rows, kernel):
        lp_fn = est.dispatch_log_prob(kernel)
        key = jax.random.key(1)
        x = jnp.stack(
            [
                jnp.abs(jax.random.normal(key, (n_rows,))) + 0.1,
                (jax.random.uniform(jax.random.fold_in(key, 1), (n_rows,))
                 < 0.5).astype(jnp.float32),
            ],
            axis=-1,
        )
        cond = jax.random.normal(jax.random.fold_in(key, 2), (n_rows, cond_dim))

        # NUTS hot loop = value_and_grad w.r.t. the condition (theta flows
        # through it); x/weights are constants there.
        @jax.jit
        def vag(c):
            val, g = jax.value_and_grad(lambda cc: jnp.sum(lp_fn(x, cc)))(c)
            return val, g

        v, g = vag(cond)
        float(np.asarray(v))  # compile + host sync (axon: transfers block)
        reps = 3
        t0 = time.time()
        for _ in range(reps):
            v, g = vag(cond)
            float(np.asarray(v) + np.asarray(g).sum())
        wall = (time.time() - t0) / reps
        return n_rows / wall, wall

    rows = []
    batches = [4096] if args.quick else [4096, 65536]
    grid = [
        # (hidden, transforms): the transforms axis isolates the spline
        # chain; the hidden axis isolates the matmuls.
        (128, 2), (128, 5), (128, 10),
        (256, 10),
    ]
    backend = jax.default_backend()
    kernel = "pallas" if backend == "tpu" else "xla"
    for hidden, transforms in grid:
        est = make_est(hidden, transforms)
        for n in batches:
            rps, wall = measure(est, n, kernel)
            row = {
                "hidden": hidden, "transforms": transforms, "rows": n,
                "kernel": kernel, "rows_per_s": round(rps, 0),
                "wall_s": round(wall, 4),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)

    # Affine decomposition in num_transforms at the largest batch (least
    # dispatch noise): wall/row = a + b * T.
    big = max(batches)
    pts = [
        (r["transforms"], 1.0 / r["rows_per_s"])
        for r in rows
        if r["hidden"] == 128 and r["rows"] == big
    ]
    summary = {}
    if len(pts) >= 2:
        ts = np.asarray([t for t, _ in pts])
        ws = np.asarray([w for _, w in pts])
        b, a = np.polyfit(ts, ws, 1)
        summary = {
            "per_row_trunk_s": float(max(a, 0.0)),
            "per_row_per_transform_s": float(max(b, 0.0)),
            "spline_share_at_T10": float(10 * b / (a + 10 * b)),
        }
        print(
            f"[kernel_profile] trunk+heads {a * 1e9:.1f} ns/row, spline "
            f"{b * 1e9:.1f} ns/row/transform -> spline share at T=10: "
            f"{summary['spline_share_at_T10']:.2f}"
        )
    h_rows = {
        r["hidden"]: r["rows_per_s"]
        for r in rows
        if r["transforms"] == 10 and r["rows"] == big
    }
    if len(h_rows) == 2:
        summary["hidden256_vs_128_slowdown"] = float(
            h_rows[128] / h_rows[256]
        )
        print(
            "[kernel_profile] hidden 256 vs 128 slowdown: "
            f"{summary['hidden256_vs_128_slowdown']:.2f}x "
            "(4x matmul FLOPs; ~1x => matmuls are not the bottleneck)"
        )

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(
        {"backend": backend, "rows": rows, "summary": summary}, indent=2
    ))
    print(f"[kernel_profile] wrote {out}")


if __name__ == "__main__":
    main()
