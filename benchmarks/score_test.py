"""Score-identity diagnostic: E_x[grad_theta log p_hat(x | theta*, s)] = 0.

For the TRUE likelihood the expected score at the generating theta* is
exactly zero (Fisher identity), so the mean model score over many simulated
trials measures local estimator misfit in each theta direction WITHOUT any
MCMC — the same quantity whose accumulation over a 50-trial session biases
the NUTS posterior (reference workload mnle.py:77-93). Reported with Monte
Carlo standard errors; dims whose |mean| >> SE are directions the learned
likelihood systematically pulls.

Caveat: near-non-regular features (the rt >= t_nd support boundary) the
score variance is huge and a sharp estimator can legitimately show large
finite-sample means — read the SE column.

Usage: MODEL_DIR=... python benchmarks/score_test.py --models m1.npz m2.npz
       [--thetas 4] [--reps 40960]
Writes artifacts/score_test.json.
"""

from __future__ import annotations

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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--models", nargs="+", required=True)
    p.add_argument("--thetas", type=int, default=4)
    p.add_argument("--reps", type=int, default=40960)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", type=str, default="artifacts/score_test.json")
    args = p.parse_args()

    from sbi_for_diffusion_models_tpu.mnle import load_model
    from sbi_for_diffusion_models_tpu.models.rt_choice_model import (
        pack_x_rt_choice,
        rt_choice_model_simulator_torch,
    )
    from sbi_for_diffusion_models_tpu.pipeline import build_prior_theta
    from sbi_for_diffusion_models_tpu.proposals import PulseSequenceProposal

    prior = build_prior_theta()
    pp = PulseSequenceProposal(80, 0.75)
    names = ["a0", "lam", "v", "B", "tau"]
    M = args.reps

    report = {}
    for mname in args.models:
        est = load_model(mname)
        rows = []
        for t in range(args.thetas):
            key = jax.random.fold_in(jax.random.key(args.seed), t)
            theta_star = jnp.asarray(prior.sample(key, (1,))[0], jnp.float32)
            s = pp.sample(jax.random.fold_in(key, 1), (M,))
            th = jnp.broadcast_to(theta_star, (M, 5))
            x = pack_x_rt_choice(
                rt_choice_model_simulator_torch(
                    th, rng=jax.random.fold_in(key, 2), pulse_sides=s
                ),
                log_rt=False,
            )

            def per_trial_score(x_i, s_i):
                def lp(theta):
                    cond = jnp.concatenate([theta, s_i], -1)
                    return est.log_prob_fn(est.params, x_i, cond)

                return jax.grad(lp)(theta_star)

            g = jax.jit(jax.vmap(per_trial_score))(x, jnp.asarray(s))
            g = np.asarray(g)
            mean, se = g.mean(0), g.std(0) / np.sqrt(M)
            rows.append(
                {
                    "theta_star": np.asarray(theta_star).tolist(),
                    "mean_score": mean.tolist(),
                    "se": se.tolist(),
                    "z": (mean / np.maximum(se, 1e-12)).tolist(),
                }
            )
            print(
                f"[score_test] {mname} theta#{t}: "
                + " ".join(
                    f"{n}={m:+.3f}±{e:.3f}" for n, m, e in zip(names, mean, se)
                ),
                flush=True,
            )
        report[mname] = rows

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(report, indent=2))
    print(f"[score_test] wrote {out}")


if __name__ == "__main__":
    main()
