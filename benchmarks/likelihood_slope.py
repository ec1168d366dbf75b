"""Profile-likelihood slope diagnostic: MNLE vs simulation ground truth.

SBC says WHETHER the posterior is calibrated; this says WHY not, in minutes:
for a fixed observed session (theta*, s_o, x_o) it sweeps one parameter
dimension and compares the MNLE summed log-likelihood profile
``L_hat(theta) = sum_i log p_hat(x_i | theta, s_i)`` against a ground-truth
estimate built from the simulator itself (choice probabilities from
frequencies + a Gaussian-KDE of rt | choice, per swept point, per trial).
A systematic offset between the argmaxes of L_hat and L_true along dimension
d is exactly the posterior bias SBC detects on d (reference oracle:
README.md:93-117; the potential under test is the reference's
potentials.py:98-117 composition).

The simulator is the ground truth here by construction -- SBC's data come
from it, so any profile disagreement is estimator misfit, not simulator
error.

Usage:
  MODEL_DIR=... python benchmarks/likelihood_slope.py \
      --models mnle_10m.npz mnle_10m_emb.npz --dims 1 2 3 \
      [--datasets 6] [--span 0.5] [--points 11] [--reps 4096]

Writes artifacts/likelihood_slope.json with, per (model, dim): the mean
offset (in sweep units) of the model profile's argmax from the truth's, and
the mean slope of (L_hat - L_true) across the sweep (negative slope on a
log-scale sweep pulls the posterior down).
"""

from __future__ import annotations

# Per-trial log-likelihood floor applied to BOTH profiles (tail saturation).
_TRIAL_FLOOR = -20.0

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from sbi_for_diffusion_models_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np


def true_loglik_profile(theta_grid, x_o, pulses_o, key, reps, kernel_fn):
    """Ground-truth sum_i log p(x_i | theta, s_i) for each theta in the grid.

    For each (grid point g, trial i): simulate ``reps`` replicates of trial i
    at (theta_g, s_i); estimate P(choice) by frequency (Laplace-smoothed) and
    p(rt | choice) by a Gaussian KDE over the replicate RTs of that choice.
    Censored trials use the frequency only (their RT is deterministic).
    """
    G = theta_grid.shape[0]
    T = x_o.shape[0]
    total = np.zeros(G)
    for g in range(G):
        th = jnp.broadcast_to(theta_grid[g], (T * reps, 5))
        s = jnp.repeat(pulses_o, reps, axis=0)
        x_sim = np.asarray(
            kernel_fn(th, s, jax.random.fold_in(key, g))
        ).reshape(T, reps, 2)
        for i in range(T):
            rt_o, ch_o = float(x_o[i, 0]), int(x_o[i, 1])
            ch_sim = x_sim[i, :, 1].astype(int)
            p_choice = ((ch_sim == ch_o).sum() + 1.0) / (reps + 3.0)
            lp = np.log(p_choice)
            if ch_o != 2:
                rts = x_sim[i, ch_sim == ch_o, 0]
                if rts.size >= 10:
                    # KDE in log-RT space (matches the estimator's transform).
                    lr = np.log(np.maximum(rts, 1e-6))
                    h = 1.06 * lr.std() * lr.size ** (-0.2) + 1e-3
                    z = (np.log(max(rt_o, 1e-6)) - lr) / h
                    dens = np.exp(-0.5 * z**2).sum() / (
                        lr.size * h * np.sqrt(2 * np.pi)
                    )
                    # change of variables back to rt
                    lp += np.log(max(dens, 1e-300)) - np.log(max(rt_o, 1e-6))
                else:
                    lp += -50.0  # choice so rare the RT density is undefined
            # Common per-trial floor with the model profile: far outside the
            # replicate support the KDE underflows to log ~ -700, which would
            # swamp the profile with tail noise irrelevant to the posterior
            # bulk.
            total[g] += max(lp, _TRIAL_FLOOR)
    return total


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--models", nargs="+", required=True)
    p.add_argument("--dims", type=int, nargs="+", default=[1, 2, 3])
    p.add_argument("--datasets", type=int, default=6)
    p.add_argument("--points", type=int, default=11)
    p.add_argument("--span", type=float, default=0.3,
                   help="sweep +-span in log-space around theta*")
    p.add_argument("--reps", type=int, default=4096)
    p.add_argument("--trials-obs", type=int, default=50)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", type=str, default="artifacts/likelihood_slope.json")
    args = p.parse_args()

    from sbi_for_diffusion_models_tpu.data_simulator import simulate_observed_session
    from sbi_for_diffusion_models_tpu.mnle import load_model
    from sbi_for_diffusion_models_tpu.models.rt_choice_model import (
        pack_x_rt_choice,
        rt_choice_model_simulator_torch,
    )
    from sbi_for_diffusion_models_tpu.pipeline import build_prior_theta
    from sbi_for_diffusion_models_tpu.run_config import RUN_CONFIG_PARAMS as cfg

    prior = build_prior_theta()

    def kernel_fn(theta, s, key):
        x = rt_choice_model_simulator_torch(
            theta, rng=key, mu_sensory=cfg.MU_SENSORY, pulse_sides=s
        )
        return pack_x_rt_choice(x, log_rt=False)
    names = ["a0", "lam", "v", "B", "tau"]

    ests = {m: load_model(m) for m in args.models}
    report = {m: {names[d]: {"argmax_offset": [], "slope_diff": []}
                  for d in args.dims} for m in args.models}

    for k in range(args.datasets):
        theta_true = np.asarray(
            prior.sample(jax.random.fold_in(jax.random.key(args.seed), k), (1,))
        )[0]
        x_o, pulses_o = simulate_observed_session(
            theta_true, args.trials_obs, seed=1000 + k,
            mu_sensory=cfg.MU_SENSORY, p_success=cfg.P_SUCCESS,
        )
        x_o = np.asarray(pack_x_rt_choice(x_o, log_rt=False))
        pulses_o = jnp.asarray(pulses_o)

        for d in args.dims:
            # log-space sweep (lam/v/B have LogNormal priors)
            base = np.log(max(theta_true[d], 1e-6))
            grid_d = np.exp(np.linspace(base - args.span, base + args.span,
                                        args.points))
            theta_grid = np.tile(theta_true, (args.points, 1)).astype(np.float32)
            theta_grid[:, d] = grid_d
            theta_grid = jnp.asarray(theta_grid)

            lt = true_loglik_profile(
                theta_grid, x_o, pulses_o,
                jax.random.fold_in(jax.random.key(args.seed + 7), k * 10 + d),
                args.reps, kernel_fn,
            )
            u = np.linspace(-args.span, args.span, args.points)

            for m, est in ests.items():
                T = x_o.shape[0]

                def model_profile(tg):
                    cond = jnp.concatenate(
                        [jnp.broadcast_to(tg[:, None, :], (args.points, T, 5)),
                         jnp.broadcast_to(pulses_o, (args.points, T,
                                                     pulses_o.shape[-1]))],
                        axis=-1,
                    )
                    xb = jnp.broadcast_to(jnp.asarray(x_o), (args.points, T, 2))
                    return jnp.sum(
                        jnp.maximum(
                            est.log_prob_fn(est.params, xb, cond), _TRIAL_FLOOR
                        ),
                        axis=-1,
                    )

                lm = np.asarray(jax.jit(model_profile)(theta_grid))
                diff = lm - lt
                # slope of the misfit along the sweep (log-units^-1)
                slope = float(np.polyfit(u, diff - diff.mean(), 1)[0])
                off = float(u[int(np.argmax(lm))] - u[int(np.argmax(lt))])
                report[m][names[d]]["argmax_offset"].append(off)
                report[m][names[d]]["slope_diff"].append(slope)
        print(f"[likelihood_slope] dataset {k + 1}/{args.datasets} done",
              flush=True)

    summary = {
        m: {
            dim: {
                "mean_argmax_offset": float(np.mean(v["argmax_offset"])),
                "mean_slope_diff": float(np.mean(v["slope_diff"])),
                "n": len(v["argmax_offset"]),
            }
            for dim, v in dims.items()
        }
        for m, dims in report.items()
    }
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps({"summary": summary, "raw": report}, indent=2))
    print(json.dumps(summary, indent=2))
    print(f"[likelihood_slope] wrote {out}")


if __name__ == "__main__":
    main()
