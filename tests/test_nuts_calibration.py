"""Statistical calibration of the NUTS implementation itself.

SBC on an analytic conjugate-Gaussian model: theta ~ N(0,1)^2,
x_i | theta ~ N(theta, sigma^2), 4 IID observations. The exact posterior is
Gaussian, so any rank non-uniformity here is a *sampler* bug (adaptation,
U-turn criterion, transition bias) — the most load-bearing correctness test
for the MCMC tier (SURVEY.md section 4: statistical equivalence is the
correctness oracle). Runs on CPU with datasets folded into the chain axis,
exactly like the production batched SBC path.
"""

import jax
import jax.numpy as jnp
import numpy as np
from scipy import stats as sps

from sbi_for_diffusion_models_tpu.inference.nuts import run_nuts

SIGMA = 0.7
N_OBS = 4
DIM = 2


def _logp(u, data):
    """Posterior log-density given the dataset's observations (N_OBS, DIM)."""
    x = data
    prior = -0.5 * jnp.sum(u**2)
    lik = -0.5 * jnp.sum((x - u[None, :]) ** 2) / SIGMA**2
    return prior + lik


def test_nuts_sbc_uniform_on_gaussian():
    D = 64  # datasets (one chain each: rank statistic needs independence)
    S = 63  # posterior draws per dataset -> ranks in {0..63}
    key = jax.random.key(0)
    theta_true = jax.random.normal(jax.random.fold_in(key, 0), (D, DIM))
    x = theta_true[:, None, :] + SIGMA * jax.random.normal(
        jax.random.fold_in(key, 1), (D, N_OBS, DIM)
    )

    init_u = jax.random.normal(jax.random.fold_in(key, 2), (D, DIM))
    samples, info = run_nuts(
        jax.random.fold_in(key, 3),
        _logp,
        init_u,
        num_warmup=200,
        num_samples=4 * S,  # thin by keeping every 4th draw: cheap decorrelation
        max_depth=8,
        data=x,
    )
    draws = np.asarray(samples)[:, ::4, :][:, :S, :]  # (D, S, DIM)
    ranks = (draws < np.asarray(theta_true)[:, None, :]).sum(axis=1)  # (D, DIM)

    # Exact posterior sanity on one dataset: mean = sum(x)/ (sigma^2 + N).
    post_prec = 1.0 + N_OBS / SIGMA**2
    want_mean = np.asarray(x[0].sum(0)) / SIGMA**2 / post_prec
    np.testing.assert_allclose(draws[0].mean(0), want_mean, atol=0.25)

    # Rank uniformity per dim: KS test against discrete-uniform-smoothed CDF.
    for d in range(DIM):
        u = (ranks[:, d] + 0.5) / (S + 1)
        p = sps.kstest(u, "uniform").pvalue
        assert p > 0.005, f"dim {d}: NUTS SBC ranks non-uniform (KS p={p:.4f})"

    assert int(np.asarray(info["diverging"]).sum()) == 0