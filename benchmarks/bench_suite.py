"""Extended benchmark suite: every hot path, one JSON line per metric.

Complements the driver-facing `bench.py` (single headline line). Run on the
TPU: `python benchmarks/bench_suite.py`. All timings force a host transfer
(block_until_ready does not synchronize on the axon tunnel).

Metrics:
  sim_scan / sim_pallas   — nominal DDM trial-steps/s at several batch sizes
  train_step              — MNLE optimizer steps/s at the default batch (4096)
  mnle_logprob            — estimator log_prob rows/s (the MCMC inner op)
  nuts                    — posterior samples/s on a 50-trial MNLE potential
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


def sync(x):
    return float(np.asarray(jax.tree.leaves(x)[0]).ravel()[0])


def timeit(fn, *args, reps=3, **kw):
    fn(*args, **kw)  # warm / compile
    sync(fn(*args, **kw))
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        sync(out)
        best = min(best, time.perf_counter() - t0)
    return best


def emit(metric, value, unit, **extra):
    print(json.dumps({"metric": metric, "value": value, "unit": unit, **extra}))


def bench_sim():
    from sbi_for_diffusion_models_tpu.models.rt_choice_model import (
        generate_pulse_matrix,
        n_pulses_max_from_schedule,
        pulse_schedule,
    )
    from sbi_for_diffusion_models_tpu.ops.ddm_scan import ddm_rt_choice_scan

    n_max, spp = pulse_schedule()
    P = n_pulses_max_from_schedule(n_max, spp)
    key = jax.random.key(0)
    kernels = {"scan": lambda th, s, k: ddm_rt_choice_scan(th, s, k, steps_per_pulse=spp, n_max=n_max)}
    if jax.default_backend() == "tpu":
        from sbi_for_diffusion_models_tpu.ops.ddm_pallas import ddm_rt_choice_pallas

        kernels["pallas"] = lambda th, s, k: ddm_rt_choice_pallas(
            th, s, k, steps_per_pulse=spp, n_max=n_max
        )
    for N in (16384, 131072, 524288):
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
        for name, fn in kernels.items():
            dt = timeit(fn, theta, pulses, jax.random.fold_in(key, 9))
            emit(f"sim_{name}", N * n_max / dt, "trial-steps/s", batch=N, wall_s=dt)


def bench_train_and_logprob():
    import optax

    from sbi_for_diffusion_models_tpu.nets.mnle_net import MNLEConfig, build_mnle

    est = build_mnle(jax.random.key(0), MNLEConfig(condition_dim=85))
    key = jax.random.key(1)
    B = 4096
    z = jax.random.normal(jax.random.fold_in(key, 0), (B, 85))
    x = jnp.stack(
        [jnp.exp(jax.random.normal(jax.random.fold_in(key, 1), (B,))),
         jax.random.randint(jax.random.fold_in(key, 2), (B,), 0, 3).astype(jnp.float32)],
        -1,
    )

    def loss_fn(params, x, z):
        return -jnp.mean(est.log_prob_fn(params, x, z))

    tx = optax.adam(5e-4)
    opt_state = tx.init(est.params)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(params, x, z)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    dt = timeit(lambda: step(est.params, opt_state)[2])
    emit("train_step", 1.0 / dt, "steps/s", batch=B, wall_s=dt)

    lp = jax.jit(lambda x, z: est.log_prob(x, z))
    dt = timeit(lp, x, z)
    emit("mnle_logprob", B / dt, "rows/s", batch=B, wall_s=dt)


def bench_nuts():
    from sbi_for_diffusion_models_tpu.mnle import run_inference_mcmc
    from sbi_for_diffusion_models_tpu.nets.mnle_net import MNLEConfig, build_mnle
    from sbi_for_diffusion_models_tpu.pipeline import build_prior_theta
    from sbi_for_diffusion_models_tpu.data_simulator import simulate_observed_session
    from sbi_for_diffusion_models_tpu.run_config import RUN_CONFIG_PARAMS

    # depth 8: deep-tree launches have crashed the single-chip tunnel worker.
    cfg = RUN_CONFIG_PARAMS.replace(
        NUM_CHAINS=8, WARMUP_STEPS=100, POSTERIOR_SAMPLES=1000,
        MCMC_MAX_TREE_DEPTH=8,
    )
    prior = build_prior_theta()
    est = build_mnle(jax.random.key(0), MNLEConfig(condition_dim=85))
    theta_true = prior.sample(jax.random.key(1), (1,))[0]
    x_o, pulses_o = simulate_observed_session(theta_true, cfg.NUM_TRIALS_OBS, seed=123)
    t0 = time.perf_counter()
    samples = run_inference_mcmc(cfg, prior, est, x_o, pulses_o, seed=2, verbose=False)
    sync(samples)
    wall = time.perf_counter() - t0  # includes compile: reported separately
    t0 = time.perf_counter()
    samples = run_inference_mcmc(cfg, prior, est, x_o, pulses_o, seed=3, verbose=False)
    sync(samples)
    dt = time.perf_counter() - t0
    emit(
        "nuts", cfg.POSTERIOR_SAMPLES / dt, "posterior-samples/s",
        chains=cfg.NUM_CHAINS, trials=cfg.NUM_TRIALS_OBS,
        wall_s=dt, compile_plus_first_run_s=wall,
    )


if __name__ == "__main__":
    emit("backend", 0, jax.default_backend())
    bench_sim()
    bench_train_and_logprob()
    bench_nuts()
