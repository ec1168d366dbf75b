"""Headline benchmark: DDM trial-steps/sec on one chip.

Runs the pulse-DDM scan kernel on the reference's default workload shape
(T_MAX=8s, dt=5e-4 -> 16,000 steps/trial, P=80 pulse slots; reference
constants.py:2-5) over a large trial batch and reports nominal trial-steps per
second (trials x n_max / wall), the workload-defined metric from
BASELINE.json. vs_baseline is the ratio to the 1e8 trial-steps/s/chip
north-star target (the reference itself publishes no numbers — BASELINE.md).

Both kernels early-exit once every trial in their granule has absorbed
(ddm_scan.py: whole-batch chunk skip; ddm_pallas.py: per-(64x128)-tile
while-loop), so the nominal number counts steps the hardware never ran. The
JSON line therefore ALSO reports ``executed_trial_steps_per_sec`` (round-4
VERDICT #6): executed work is derived exactly from the outputs — activity is
monotone (absorption is permanent, the decision window fixed), so a granule
runs ceil(max_trial done_step / chunk) chunks, where done_step =
(rt - t_nd)/dt is recoverable per trial from the returned RT.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline",
"executed_trial_steps_per_sec", "executed_fraction"}.
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

    # Executed trial-steps, derived exactly from the last rep's outputs (see
    # module docstring). done_step = hit_step for absorbed trials and the
    # censor window n_steps otherwise — both equal round((rt - t_nd)/dt_sim)
    # because rt = clip(t_nd + done_step*dt, 1e-6, T_MAX) never saturates
    # (done_step <= floor((T_MAX - t_nd)/dt)); ddm_scan.py:216-218.
    import numpy as np

    from sbi_for_diffusion_models_tpu.constants import DT_CHOICE
    from sbi_for_diffusion_models_tpu.ops.ddm_scan import sanitize_theta

    rt = np.asarray(out[:, 0], dtype=np.float64)
    t_nd = np.asarray(sanitize_theta(theta)[4], dtype=np.float64)
    done_step = np.rint((rt - t_nd) / float(DT_CHOICE))
    if jax.default_backend() == "tpu":
        # Pallas kernel: one while-loop per (64x128)-trial tile, exiting when
        # the whole tile is done; granule = tile, chunk = steps_per_pulse.
        tile = 64 * 128
        granule_max = done_step.reshape(-1, tile).max(axis=1)
        chunks = np.ceil(granule_max / spp)
        executed = float((chunks * spp * tile).sum())
    else:
        # XLA scan kernel: one lax.cond per chunk over the WHOLE batch, so a
        # chunk executes for all N trials while any trial is active.
        chunk = min(200, spp)
        executed = float(np.ceil(done_step.max() / chunk) * chunk * N)

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
                "executed_trial_steps_per_sec": executed / dt,
                "executed_fraction": executed / trial_steps,
            }
        )
    )


if __name__ == "__main__":
    main()
