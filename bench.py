"""Headline benchmark: DDM trial-steps/sec on one chip.

Runs the pulse-DDM scan kernel on the reference's default workload shape
(T_MAX=8s, dt=5e-4 -> 16,000 steps/trial, P=80 pulse slots; reference
constants.py:2-5) over a large trial batch and reports nominal trial-steps per
second (trials x n_max / wall), the workload-defined metric from
BASELINE.json. vs_baseline is the ratio to the 1e8 trial-steps/s/chip
north-star target (the reference itself publishes no numbers — BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import jax.numpy as jnp


def main():
    from sbi_for_diffusion_models_tpu.models.rt_choice_model import (
        dispatch_sim_kernel,
        generate_pulse_matrix,
        n_pulses_max_from_schedule,
        pulse_schedule,
    )
    from sbi_for_diffusion_models_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    n_max, spp = pulse_schedule()
    P = n_pulses_max_from_schedule(n_max, spp)

    N = 131_072  # trial batch per kernel launch
    key = jax.random.key(0)
    # Realistic prior-scale parameters (reference rt_choice_model_pipeline.py:34-46).
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

    kernel = dispatch_sim_kernel()  # pallas on TPU, XLA scan elsewhere

    def run(k):
        return kernel(
            theta, pulses, k,
            mu_sensory=1.0, collapse_rate=0.0,
            steps_per_pulse=spp, n_max=n_max,
        )

    def sync(x):
        # block_until_ready does not reliably synchronize on the axon TPU
        # tunnel; a host transfer does.
        import numpy as _np

        return float(_np.asarray(x[:, 0]).sum())

    # Warmup / compile.
    sync(run(jax.random.fold_in(key, 100)))

    reps = 5
    t0 = time.perf_counter()
    for r in range(reps):
        out = run(jax.random.fold_in(key, 200 + r))
    sync(out)
    dt = (time.perf_counter() - t0) / reps

    trial_steps = N * n_max
    value = trial_steps / dt
    target = 1e8  # north-star: >=1e8 DDM trial-steps/sec/chip (BASELINE.json)
    print(
        json.dumps(
            {
                "metric": "ddm_trial_steps_per_sec_per_chip",
                "value": value,
                "unit": "trial-steps/s",
                "vs_baseline": value / target,
            }
        )
    )


if __name__ == "__main__":
    main()
