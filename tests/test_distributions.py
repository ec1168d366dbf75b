"""Tests for the pure-JAX distribution & bijector library."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy import stats

from sbi_for_diffusion_models_tpu.distributions import (
    Beta,
    LogNormal,
    MultipleIndependent,
    Normal,
    Uniform,
    mcmc_transform,
)


def test_beta_logprob_matches_scipy():
    d = Beta(2.0, 2.0)
    xs = np.linspace(0.01, 0.99, 11)
    lp = np.array([float(d.log_prob(jnp.array([x]))) for x in xs])
    np.testing.assert_allclose(lp, stats.beta(2, 2).logpdf(xs), atol=1e-3)
    assert float(d.log_prob(jnp.array([-0.1]))) == -np.inf
    assert float(d.log_prob(jnp.array([1.1]))) == -np.inf


def test_lognormal_logprob_matches_scipy():
    d = LogNormal(-1.0, 1.0)
    xs = np.array([0.05, 0.3, 1.0, 4.0])
    lp = np.array([float(d.log_prob(jnp.array([x]))) for x in xs])
    ref = stats.lognorm(s=1.0, scale=np.exp(-1.0)).logpdf(xs)
    np.testing.assert_allclose(lp, ref, rtol=1e-3, atol=1e-4)
    assert float(d.log_prob(jnp.array([-1.0]))) == -np.inf


def test_sampling_moments():
    key = jax.random.key(0)
    b = Beta(2.0, 2.0).sample(key, (20000,))
    assert abs(float(b.mean()) - 0.5) < 0.01
    ln = LogNormal(0.0, 0.5).sample(key, (20000,))
    assert abs(float(jnp.log(ln).mean())) < 0.02
    n = Normal(1.0, 2.0).sample(key, (20000,))
    assert abs(float(n.mean()) - 1.0) < 0.05
    u = Uniform(-1.0, 3.0).sample(key, (20000,))
    assert abs(float(u.mean()) - 1.0) < 0.05


def build_prior():
    return MultipleIndependent(
        [
            Beta(2.0, 2.0),
            LogNormal(-1.0, 1.0),
            LogNormal(0.0, 1.0),
            LogNormal(2.75, 0.5),
            Beta(2.0, 2.0),
        ]
    )


def test_multiple_independent():
    prior = build_prior()
    assert prior.event_shape == (5,)
    th = prior.sample(jax.random.key(1), (64,))
    assert th.shape == (64, 5)
    lp = prior.log_prob(th)
    assert lp.shape == (64,)
    assert np.all(np.isfinite(np.asarray(lp)))
    # log_prob is the sum of the marginals.
    manual = (
        stats.beta(2, 2).logpdf(np.asarray(th[:, 0]))
        + stats.lognorm(1.0, scale=np.exp(-1)).logpdf(np.asarray(th[:, 1]))
        + stats.lognorm(1.0, scale=1.0).logpdf(np.asarray(th[:, 2]))
        + stats.lognorm(0.5, scale=np.exp(2.75)).logpdf(np.asarray(th[:, 3]))
        + stats.beta(2, 2).logpdf(np.asarray(th[:, 4]))
    )
    np.testing.assert_allclose(np.asarray(lp), manual, rtol=2e-4, atol=1e-4)


def test_mcmc_transform_roundtrip_and_logdet():
    prior = build_prior()
    tf = mcmc_transform(prior)
    theta = prior.sample(jax.random.key(2), (128,))
    u = tf.inverse(theta)
    back = tf.forward(u)
    np.testing.assert_allclose(np.asarray(back), np.asarray(theta), rtol=1e-4)
    # forward maps all of R^5 into the support.
    z = jax.random.normal(jax.random.key(3), (128, 5)) * 3
    th = np.asarray(tf.forward(z))
    assert np.all(th[:, 0] > 0) and np.all(th[:, 0] < 1)
    assert np.all(th[:, 1:4] > 0)
    assert np.all(th[:, 4] > 0) and np.all(th[:, 4] < 1)
    # log-det matches autodiff jacobian.
    u0 = jnp.array([0.3, -0.5, 1.2, 0.1, -2.0])
    J = jax.jacfwd(tf.forward)(u0)
    ld_auto = float(jnp.log(jnp.abs(jnp.diag(J))).sum())
    np.testing.assert_allclose(float(tf.forward_log_det(u0)), ld_auto, rtol=1e-4)


def test_transformed_density_integrates_to_one():
    # Check change-of-variables: integral over u of p(f(u)) |df/du| = 1 for a
    # 1-D Beta marginal.
    d = Beta(2.0, 2.0)
    tf = mcmc_transform(d)
    us = jnp.linspace(-12, 12, 20001).reshape(-1, 1)
    dens = jnp.exp(d.log_prob(tf.forward(us)) + tf.forward_log_det(us))
    integral = float(jnp.trapezoid(dens, us[:, 0]))
    assert abs(integral - 1.0) < 1e-3
