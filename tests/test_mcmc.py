"""MCMC engines: NUTS and slice on analytic posteriors; MCMCPosterior wiring."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sbi_for_diffusion_models_tpu.distributions import (
    Beta,
    LogNormal,
    MultipleIndependent,
    mcmc_transform,
)
from sbi_for_diffusion_models_tpu.inference.mcmc import MCMCPosterior
from sbi_for_diffusion_models_tpu.inference.nuts import run_nuts
from sbi_for_diffusion_models_tpu.inference.slice import run_slice

COV = jnp.array([[2.0, 0.9], [0.9, 1.0]])
MU = jnp.array([1.0, -2.0])
PREC = jnp.linalg.inv(COV)


def gauss_logp(u):
    d = u - MU
    return -0.5 * d @ PREC @ d


def test_nuts_gaussian_moments():
    init = jax.random.normal(jax.random.key(1), (4, 2))
    samples, info = run_nuts(
        jax.random.key(2), gauss_logp, init, num_warmup=400, num_samples=700
    )
    s = np.asarray(samples).reshape(-1, 2)
    np.testing.assert_allclose(s.mean(0), np.asarray(MU), atol=0.15)
    np.testing.assert_allclose(np.cov(s.T), np.asarray(COV), atol=0.3)
    assert int(info["diverging"].sum()) == 0


def test_nuts_accept_prob_near_target():
    init = jax.random.normal(jax.random.key(3), (2, 2))
    _, info = run_nuts(
        jax.random.key(4), gauss_logp, init, num_warmup=400, num_samples=200,
        target_accept=0.8,
    )
    ap = float(info["accept_prob"].mean())
    assert 0.6 < ap <= 1.0, f"accept prob {ap} far from target"


def test_slice_gaussian_moments():
    init = jax.random.normal(jax.random.key(5), (4, 2))
    samples, _ = run_slice(
        jax.random.key(6), gauss_logp, init, num_warmup=150, num_samples=600
    )
    s = np.asarray(samples).reshape(-1, 2)
    np.testing.assert_allclose(s.mean(0), np.asarray(MU), atol=0.2)
    np.testing.assert_allclose(np.cov(s.T), np.asarray(COV), atol=0.35)


class _GaussPotential:
    """Minimal potential object for MCMCPosterior (prior already folded in)."""

    def potential_fn(self, theta, x=None):
        # A product of constrained marginals: Beta(5,5) x LogNormal(0, 0.5).
        prior = MultipleIndependent([Beta(5.0, 5.0), LogNormal(0.0, 0.5)])
        return prior.log_prob(theta)

    def set_x_o(self, x):
        pass


@pytest.mark.parametrize("method", ["nuts", "slice"])
def test_mcmc_posterior_respects_support_and_shape(method):
    prior = MultipleIndependent([Beta(5.0, 5.0), LogNormal(0.0, 0.5)])
    post = MCMCPosterior(
        potential_fn=_GaussPotential(),
        proposal=prior,
        theta_transform=mcmc_transform(prior),
        method=method,
        num_chains=4,
        warmup_steps=150,
        verbose=False,
    )
    samples = post.sample((500,), key=jax.random.key(7))
    s = np.asarray(samples)
    assert s.shape == (500, 2)
    assert (s[:, 0] > 0).all() and (s[:, 0] < 1).all()  # Beta support
    assert (s[:, 1] > 0).all()  # LogNormal support
    # Sampling the prior via its own potential should recover prior moments.
    assert abs(s[:, 0].mean() - 0.5) < 0.06
    ref = float(np.exp(0.5 * 0.25))  # LogNormal mean e^{sigma^2/2}
    assert abs(s[:, 1].mean() - ref) < 0.25
