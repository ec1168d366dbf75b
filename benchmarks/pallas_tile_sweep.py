"""Sweep the Pallas DDM kernel's trial-tile size (VMEM residency knob).

Usage (TPU): python benchmarks/pallas_tile_sweep.py
Prints one JSON line per (tile_rows, batch) with nominal trial-steps/s.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

from sbi_for_diffusion_models_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()
import jax.numpy as jnp
import numpy as np


def main():
    from sbi_for_diffusion_models_tpu.models.rt_choice_model import (
        generate_pulse_matrix,
        n_pulses_max_from_schedule,
        pulse_schedule,
    )
    from sbi_for_diffusion_models_tpu.ops.ddm_pallas import ddm_rt_choice_pallas

    n_max, spp = pulse_schedule()
    P = n_pulses_max_from_schedule(n_max, spp)
    key = jax.random.key(0)
    N = 131_072
    theta = jnp.stack(
        [
            jax.random.beta(jax.random.fold_in(key, 0), 2.0, 2.0, (N,)),
            jnp.exp(-1.0 + jax.random.normal(jax.random.fold_in(key, 1), (N,))),
            jnp.exp(jax.random.normal(jax.random.fold_in(key, 2), (N,))),
            jnp.exp(2.75 + 0.5 * jax.random.normal(jax.random.fold_in(key, 3), (N,))),
            jax.random.beta(jax.random.fold_in(key, 4), 2.0, 2.0, (N,)),
        ],
        axis=-1,
    ).astype(jnp.float32)
    pulses = generate_pulse_matrix(jax.random.fold_in(key, 5), N, P)

    for R in (16, 32, 64, 128):
        try:
            fn = lambda k: ddm_rt_choice_pallas(
                theta, pulses, k, steps_per_pulse=spp, n_max=n_max, tile_rows=R
            )
            float(np.asarray(fn(jax.random.fold_in(key, 90))[:, 0]).sum())  # compile
            best = np.inf
            for r in range(3):
                t0 = time.perf_counter()
                out = fn(jax.random.fold_in(key, 100 + r))
                float(np.asarray(out[:, 0]).sum())
                best = min(best, time.perf_counter() - t0)
            print(
                json.dumps(
                    {
                        "metric": "pallas_tile_sweep",
                        "tile_rows": R,
                        "value": N * n_max / best,
                        "unit": "trial-steps/s",
                        "wall_s": best,
                    }
                ),
                flush=True,
            )
        except Exception as e:
            print(json.dumps({"metric": "pallas_tile_sweep", "tile_rows": R, "error": str(e)[:100]}), flush=True)


if __name__ == "__main__":
    main()
