"""RQ-spline transform: invertibility, log-det correctness, tail behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sbi_for_diffusion_models_tpu.nets.spline import (
    num_spline_params,
    rq_spline_forward,
    rq_spline_inverse,
)

K, B = 24, 5.0


@pytest.fixture(scope="module")
def params():
    return jax.random.normal(jax.random.key(0), (256, num_spline_params(K))) * 0.7


def test_roundtrip(params):
    x = jnp.linspace(-7.0, 7.0, 256)
    y, ld = rq_spline_forward(x, params, num_bins=K, tail_bound=B)
    x2, ld_inv = rq_spline_inverse(y, params, num_bins=K, tail_bound=B)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ld + ld_inv), 0.0, atol=1e-3)


def test_log_det_matches_numerical_derivative(params):
    x = jnp.linspace(-4.5, 4.5, 256)

    def f_scalar(xi, p):
        y, _ = rq_spline_forward(xi, p, num_bins=K, tail_bound=B)
        return y

    dydx = jax.vmap(jax.grad(f_scalar))(x, params)
    _, ld = rq_spline_forward(x, params, num_bins=K, tail_bound=B)
    np.testing.assert_allclose(np.asarray(ld), np.log(np.asarray(dydx)), atol=1e-3)


def test_monotone(params):
    x = jnp.linspace(-5.0, 5.0, 256)
    y, _ = rq_spline_forward(x, params[:1].repeat(256, 0), num_bins=K, tail_bound=B)
    assert bool(jnp.all(jnp.diff(y) > 0))


def test_identity_tails(params):
    x = jnp.array([-6.0, 6.5, 100.0, -42.0])
    y, ld = rq_spline_forward(x, params[:4], num_bins=K, tail_bound=B)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x))
    np.testing.assert_allclose(np.asarray(ld), 0.0)
