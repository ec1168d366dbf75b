"""Coupling NSF + SNPE/SNLE: invertibility, normalization, recovery."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sbi_for_diffusion_models_tpu.distributions import BoxUniform, Normal, MultipleIndependent
from sbi_for_diffusion_models_tpu.nets.flows import (
    CouplingNSF,
    NSFConfig,
    build_flow,
    fit_flow,
)
from sbi_for_diffusion_models_tpu.run_config import RUN_CONFIG_PARAMS
from sbi_for_diffusion_models_tpu.snpe import train_snle, train_snpe


@pytest.fixture(scope="module")
def flow3d():
    cfg = NSFConfig(dim=3, context_dim=2, hidden_features=32, num_transforms=4, num_bins=8)
    return build_flow(jax.random.key(0), cfg)


def test_sample_logprob_shapes(flow3d):
    ctx = jax.random.normal(jax.random.key(1), (64, 2))
    s = flow3d.sample(jax.random.key(2), ctx)
    assert s.shape == (64, 3)
    lp = flow3d.log_prob(s, ctx)
    assert lp.shape == (64,)
    assert bool(jnp.isfinite(lp).all())


def test_untrained_flow_normalizes_2d():
    """MC check: E_base[1] via importance sampling ~ 1 over a grid."""
    cfg = NSFConfig(dim=2, context_dim=1, hidden_features=16, num_transforms=3, num_bins=6)
    flow = build_flow(jax.random.key(3), cfg)
    g = jnp.linspace(-8, 8, 120)
    xx, yy = jnp.meshgrid(g, g)
    pts = jnp.stack([xx.ravel(), yy.ravel()], -1)
    ctx = jnp.zeros((pts.shape[0], 1))
    lp = jax.jit(flow.log_prob)(pts, ctx)
    cell = float(g[1] - g[0]) ** 2
    total = float(jnp.exp(lp).sum() * cell)
    assert abs(total - 1.0) < 0.05, total


def test_fit_flow_learns_conditional_gaussian():
    key = jax.random.key(4)
    n = 4000
    c = jax.random.normal(jax.random.fold_in(key, 0), (n, 1))
    y = jnp.concatenate(
        [
            2.0 * c + 0.3 * jax.random.normal(jax.random.fold_in(key, 1), (n, 1)),
            -c + 0.5 * jax.random.normal(jax.random.fold_in(key, 2), (n, 1)),
        ],
        axis=-1,
    )
    cfg = NSFConfig(dim=2, context_dim=1, hidden_features=32, num_transforms=4, num_bins=8)
    flow = build_flow(
        jax.random.fold_in(key, 3), cfg,
        y_mean=y.mean(0), y_std=y.std(0), c_mean=c.mean(0), c_std=c.std(0),
    )
    flow = fit_flow(flow, y, c, max_epochs=80, patience=15, batch_size=512, seed=5)
    ctx = jnp.full((2000, 1), 1.0)
    s = np.asarray(flow.sample(jax.random.key(6), ctx))
    np.testing.assert_allclose(s.mean(0), [2.0, -1.0], atol=0.25)
    np.testing.assert_allclose(s.std(0), [0.3, 0.5], atol=0.15)


def test_snpe_recovers_gaussian_posterior():
    """theta ~ N(0,1)^2, x = theta + N(0, 0.5) -> posterior N(0.8 x, 0.447^2... )"""
    key = jax.random.key(7)
    n = 6000
    prior = MultipleIndependent([Normal(0.0, 1.0), Normal(0.0, 1.0)])
    theta = jax.random.normal(jax.random.fold_in(key, 0), (n, 2))
    x = theta + 0.5 * jax.random.normal(jax.random.fold_in(key, 1), (n, 2))
    cfg = RUN_CONFIG_PARAMS.replace(TRAIN_MAX_EPOCHS=60, TRAIN_STOP_AFTER_EPOCHS=12, TRAIN_BATCH_SIZE=512)
    post = train_snpe(cfg, prior, theta, x, hidden_features=32, num_transforms=4, num_bins=8, seed=8)
    x_o = jnp.array([1.0, -1.0])
    s = np.asarray(post.sample((3000,), x_o, seed=9))
    # Analytic posterior: mean = x/(1+0.25) = 0.8 x, var = 0.25/1.25 = 0.2
    np.testing.assert_allclose(s.mean(0), [0.8, -0.8], atol=0.12)
    np.testing.assert_allclose(s.std(0), np.sqrt(0.2), atol=0.08)


def test_snpe_respects_prior_support():
    key = jax.random.key(10)
    n = 3000
    prior = BoxUniform(jnp.zeros(2), jnp.ones(2))
    theta = jax.random.uniform(jax.random.fold_in(key, 0), (n, 2))
    x = theta + 0.1 * jax.random.normal(jax.random.fold_in(key, 1), (n, 2))
    cfg = RUN_CONFIG_PARAMS.replace(TRAIN_MAX_EPOCHS=30, TRAIN_STOP_AFTER_EPOCHS=8, TRAIN_BATCH_SIZE=512)
    post = train_snpe(cfg, prior, theta, x, hidden_features=16, num_transforms=3, num_bins=6, seed=11)
    s = np.asarray(post.sample((500,), jnp.array([0.05, 0.95]), seed=12))
    inside = ((s >= 0) & (s <= 1)).all(axis=1).mean()
    assert inside > 0.95, f"only {inside:.2%} inside prior support"


def test_snle_posterior_on_gaussian():
    key = jax.random.key(13)
    n = 12000
    prior = MultipleIndependent([Normal(0.0, 1.0)])
    theta = jax.random.normal(jax.random.fold_in(key, 0), (n, 1))
    x = theta + 0.5 * jax.random.normal(jax.random.fold_in(key, 1), (n, 1))
    cfg = RUN_CONFIG_PARAMS.replace(
        TRAIN_MAX_EPOCHS=100, TRAIN_STOP_AFTER_EPOCHS=15, TRAIN_BATCH_SIZE=1024,
        NUM_CHAINS=2, WARMUP_STEPS=80,
    )
    flow, make_posterior = train_snle(
        cfg, prior, theta, x, hidden_features=32, num_transforms=4, num_bins=8, seed=14
    )
    x_o = jnp.full((4, 1), 1.0)  # 4 IID obs of theta* with noise 0.5
    posterior = make_posterior(x_o)
    s = np.asarray(posterior.sample((600,), key=jax.random.key(15)))
    # Analytic: posterior precision = 1 + 4/0.25 = 17, mean = (4/0.25)/17 = 16/17.
    # Tolerance is generous: likelihood-approximation error is multiplied by
    # the 4 IID observations.
    np.testing.assert_allclose(s.mean(), 16 / 17, atol=0.2)
    np.testing.assert_allclose(s.std(), 1 / np.sqrt(17), atol=0.1)
