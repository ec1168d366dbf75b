"""Fitting real behavioral sessions (the pulse_ddm_model.ipynb workflow).

Reference workflow (src/notebooks/pulse_ddm_model.ipynb cells 7-9): load a
per-trial behavioral table (`rat_data_clean.csv`: subject, RT, choice),
pack it into the MNLE x-convention, and fit each subject — here shown both
independently (as the notebook did) and jointly with the hierarchical model.
The real CSV is not shipped; synthetic sessions stand in so the script runs
end-to-end anywhere.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from sbi_for_diffusion_models_tpu.datasets import make_x_from_rat_df, split_by_subject
from sbi_for_diffusion_models_tpu.mnle import load_model, run_inference_mcmc
from sbi_for_diffusion_models_tpu.models.hierarchical import run_hierarchical_inference
from sbi_for_diffusion_models_tpu.models.rt_choice_model import (
    generate_pulse_matrix,
    n_pulses_max_from_schedule,
    pack_x_rt_choice,
    pulse_schedule,
    rt_choice_model_simulator_torch,
)
from sbi_for_diffusion_models_tpu.nets.mnle_net import MNLEConfig, build_mnle
from sbi_for_diffusion_models_tpu.pipeline import build_prior_theta
from sbi_for_diffusion_models_tpu.run_config import RUN_CONFIG_PARAMS


def synthetic_rat_table(num_rats=3, trials=30, seed=0):
    """Stand-in for rat_data_clean.csv: per-trial (subject, rt, choice) plus
    the realized stimulus for each trial."""
    key = jax.random.key(seed)
    prior = build_prior_theta()
    P = n_pulses_max_from_schedule(*pulse_schedule())
    rows = {"subject": [], "rt": [], "choice": []}
    pulses_all = []
    for r in range(num_rats):
        theta = prior.sample(jax.random.fold_in(key, r), (1,))[0]
        pulses = generate_pulse_matrix(jax.random.fold_in(key, 100 + r), trials, P)
        x = rt_choice_model_simulator_torch(
            jnp.tile(theta, (trials, 1)), rng=jax.random.fold_in(key, 200 + r),
            pulse_sides=pulses,
        )
        rows["subject"].extend([r] * trials)
        rows["rt"].extend(np.asarray(x[:, 0]).tolist())
        rows["choice"].extend(np.asarray(x[:, 1]).tolist())
        pulses_all.append(np.asarray(pulses))
    return {k: np.asarray(v) for k, v in rows.items()}, np.stack(pulses_all)


def main():
    cfg = RUN_CONFIG_PARAMS.replace(NUM_CHAINS=4, WARMUP_STEPS=80, POSTERIOR_SAMPLES=300)
    prior = build_prior_theta()
    df, pulses = synthetic_rat_table()

    # Pack the behavioral table (pulse_ddm_model.ipynb's make_x_from_rat_df).
    ids, xs = split_by_subject(df, log_rt=cfg.LOG_RT_MANUALLY)
    print(f"subjects: {ids}, trials each: {[int(x.shape[0]) for x in xs]}")

    # A trained MNLE is required; try the saved models in preference order,
    # else a fresh (untrained) one so the script still demonstrates the flow.
    est = None
    for name in ("mnle_large_budget.npz", "mnle_calibration.npz", None):
        try:
            est = load_model(name) if name else load_model()
            print(f"loaded trained MNLE ({name or 'default'})")
            break
        except FileNotFoundError:
            continue
    if est is None:
        est = build_mnle(jax.random.key(0), MNLEConfig(condition_dim=85))
        print("NOTE: no saved model found; using an untrained MNLE (demo only)")

    # Per-rat independent fits (the notebook's loop).
    for i, (sid, x_s) in enumerate(zip(ids, xs)):
        samples = run_inference_mcmc(
            cfg, prior, est, x_s, jnp.asarray(pulses[i]), seed=i, verbose=False
        )
        print(f"rat {sid}: posterior mean {np.asarray(samples).mean(0).round(3)}")

    # Joint hierarchical fit (capability beyond the notebook).
    x_stack = jnp.stack([jnp.asarray(x) for x in xs])
    out = run_hierarchical_inference(
        est, prior, x_stack, jnp.asarray(pulses),
        num_chains=4, num_warmup=80, num_samples=150,
    )
    print("population posterior mean:", out["population_theta"].mean(0).round(3))


if __name__ == "__main__":
    main()
