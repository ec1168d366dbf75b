"""Potentials: tiling math parity, masking, temperature, gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sbi_for_diffusion_models_tpu.distributions import (
    Beta,
    LogNormal,
    MultipleIndependent,
)
from sbi_for_diffusion_models_tpu.nets.mnle_net import MNLEConfig, build_mnle
from sbi_for_diffusion_models_tpu.potentials import (
    ConditionedMNLELogLikelihood,
    ThetaOnlyPosteriorPotential,
)

T, P, D = 7, 6, 2  # trials, pulses, theta dim


@pytest.fixture(scope="module")
def setup():
    cfg = MNLEConfig(
        condition_dim=D + P, num_categories=3,
        hidden_features=16, num_transforms=2, num_bins=5,
    )
    est = build_mnle(jax.random.key(0), cfg)
    key = jax.random.key(1)
    x = jnp.stack(
        [jnp.exp(jax.random.normal(jax.random.fold_in(key, 0), (T,))),
         jnp.clip(jax.random.randint(jax.random.fold_in(key, 1), (T,), 0, 3), 0, 2).astype(jnp.float32)],
        -1,
    )
    pulses = jnp.where(jax.random.uniform(jax.random.fold_in(key, 2), (T, P)) < 0.5, 1.0, -1.0)
    prior = MultipleIndependent([Beta(2.0, 2.0), LogNormal(0.0, 1.0)])
    return est, x, pulses, prior


def test_summed_loglik_matches_manual_tiling(setup):
    """vmap-over-(trials, thetas) == the reference's explicit tiling
    (reference potentials.py:98-117)."""
    est, x, pulses, _ = setup
    ll = ConditionedMNLELogLikelihood(est, pulses)
    theta = jnp.array([[0.4, 1.2], [0.7, 0.5], [0.2, 2.0]])
    out = ll(x, theta)
    assert out.shape == (1, 3)

    manual = np.zeros(3)
    for n in range(3):
        for t in range(T):
            cond = jnp.concatenate([theta[n], pulses[t]])
            manual[n] += float(est.log_prob(x[t : t + 1], cond[None])[0])
    np.testing.assert_allclose(np.asarray(out[0]), manual, rtol=1e-4)


def test_potential_prior_plus_tempered_loglik(setup):
    est, x, pulses, prior = setup
    ll = ConditionedMNLELogLikelihood(est, pulses)
    theta = jnp.array([[0.4, 1.2], [0.7, 0.5]])
    for temp in (1.0, 2.5):
        pot = ThetaOnlyPosteriorPotential(prior, ll, x_o=x, temperature=temp)
        got = pot(theta)
        want = prior.log_prob(theta) + ll(x, theta)[0] / temp
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)


def test_potential_masks_out_of_support(setup):
    est, x, pulses, prior = setup
    pot = ThetaOnlyPosteriorPotential(prior, ll := ConditionedMNLELogLikelihood(est, pulses), x_o=x)
    theta = jnp.array([[1.5, 1.0], [0.5, -1.0], [0.5, 1.0]])  # first two invalid
    out = np.asarray(pot(theta))
    assert out[0] == -np.inf and out[1] == -np.inf
    assert np.isfinite(out[2])


def test_potential_fn_is_differentiable(setup):
    est, x, pulses, prior = setup
    pot = ThetaOnlyPosteriorPotential(prior, ConditionedMNLELogLikelihood(est, pulses), x_o=x)
    g = jax.grad(pot.potential_fn)(jnp.array([0.4, 1.2]))
    assert g.shape == (2,)
    assert bool(jnp.all(jnp.isfinite(g)))


def test_trial_count_mismatch_raises(setup):
    est, x, pulses, _ = setup
    ll = ConditionedMNLELogLikelihood(est, pulses)
    with pytest.raises(ValueError):
        ll(x[:-1], jnp.array([[0.4, 1.2]]))
