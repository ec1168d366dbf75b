"""Pallas-fused MNLE kernel: value + gradient parity vs the XLA path.

Runs in interpret mode so the fused forward/backward kernels are exercised
by every CPU CI run; the same op compiles on TPU (bench path).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sbi_for_diffusion_models_tpu.nets.mnle_net import MNLEConfig, build_mnle
from sbi_for_diffusion_models_tpu.ops.mnle_pallas import make_fused_logprob

SMALL = dict(hidden_features=32, num_transforms=4, num_bins=8)


def _make_est(condition_dim=9, **kw):
    cfg = MNLEConfig(condition_dim=condition_dim, num_categories=3, **SMALL, **kw)
    est = build_mnle(jax.random.key(0), cfg)
    # Non-trivial standardization stats so the outer transforms are exercised.
    return est.__class__(
        cfg=cfg,
        params=est.params,
        cond_mean=0.1 * jnp.arange(condition_dim, dtype=jnp.float32),
        cond_std=jnp.linspace(0.5, 2.0, condition_dim),
        x_mean=jnp.float32(0.3),
        x_std=jnp.float32(1.7),
        train_meta=None,
    )


def _data(key, n, condition_dim):
    k1, k2, k3 = jax.random.split(key, 3)
    rt = jnp.exp(0.5 * jax.random.normal(k1, (n,)))
    choice = jax.random.randint(k2, (n,), 0, 3).astype(jnp.float32)
    x = jnp.stack([rt, choice], -1)
    cond = jax.random.normal(k3, (n, condition_dim)) * 0.7 + 0.2
    return x, cond


def test_fused_value_parity():
    est = _make_est()
    fused = make_fused_logprob(est, interpret=True)
    x, cond = _data(jax.random.key(1), 37, 9)  # non-multiple-of-8 rows
    ref = est.log_prob_fn(est.params, x, cond)
    got = fused(x, cond)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_fused_gradient_parity():
    """d log_prob / d condition must match the XLA path (the NUTS use case:
    theta gradients flow through the condition)."""
    est = _make_est()
    fused = make_fused_logprob(est, interpret=True)
    x, cond = _data(jax.random.key(2), 16, 9)

    def total_ref(c):
        return jnp.sum(est.log_prob_fn(est.params, x, c))

    def total_fused(c):
        return jnp.sum(fused(x, c))

    g_ref = jax.grad(total_ref)(cond)
    g_fused = jax.grad(total_fused)(cond)
    np.testing.assert_allclose(
        np.asarray(g_fused), np.asarray(g_ref), rtol=1e-4, atol=1e-5
    )


def test_fused_vmap_grad_composition():
    """The potential vmaps chains over (theta -> summed trial log-lik);
    the fused op must compose with vmap + grad exactly like the XLA path."""
    est = _make_est(condition_dim=9)
    fused = make_fused_logprob(est, interpret=True)
    T, C = 11, 4  # trials, chains
    x, _ = _data(jax.random.key(3), T, 9)
    pulses = jnp.where(
        jax.random.uniform(jax.random.key(4), (T, 4)) < 0.5, 1.0, -1.0
    )
    thetas = jnp.abs(jax.random.normal(jax.random.key(5), (C, 5))) + 0.3

    def loglik(theta, lp_fn):
        cond = jnp.concatenate(
            [jnp.broadcast_to(theta, (T, 5)), pulses], axis=-1
        )
        return jnp.sum(lp_fn(x, cond))

    ref_fn = lambda th: loglik(th, lambda a, b: est.log_prob_fn(est.params, a, b))
    fused_fn = lambda th: loglik(th, fused)

    v_ref = jax.vmap(ref_fn)(thetas)
    v_fused = jax.vmap(fused_fn)(thetas)
    np.testing.assert_allclose(np.asarray(v_fused), np.asarray(v_ref), rtol=2e-5)

    g_ref = jax.vmap(jax.grad(ref_fn))(thetas)
    g_fused = jax.vmap(jax.grad(fused_fn))(thetas)
    np.testing.assert_allclose(
        np.asarray(g_fused), np.asarray(g_ref), rtol=1e-4, atol=1e-5
    )


def test_fused_with_embedding_context():
    """Embedding-enabled estimators route their context through the same
    fused kernel (context building stays in XLA)."""
    cfg_kw = dict(pulse_dim=4, embed_dim=6)
    est = _make_est(condition_dim=9, **cfg_kw)
    fused = make_fused_logprob(est, interpret=True)
    x, _ = _data(jax.random.key(6), 12, 9)
    theta = jnp.abs(jax.random.normal(jax.random.key(7), (12, 5))) + 0.3
    pulses = jnp.where(jax.random.uniform(jax.random.key(8), (12, 4)) < 0.5, 1.0, -1.0)
    cond = jnp.concatenate([theta, pulses], -1)
    ref = est.log_prob_fn(est.params, x, cond)
    got = fused(x, cond)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_fused_pulse_rep_value_and_grad_parity():
    """Fused kernel for rt_rep='pulse' (absolute anchor): value + theta-grad
    parity vs the XLA path, including gradients through the sin/cos phase
    features (t_nd) and the censored mask."""
    cfg = MNLEConfig(
        condition_dim=9, num_categories=3, rt_rep="pulse", censor_rt=True,
        grid_anchor="absolute", num_pulse_slots=16, pulse_interval=0.1,
        **SMALL,
    )
    est = build_mnle(jax.random.key(9), cfg)
    fused = make_fused_logprob(est, interpret=True)
    T = 13
    key = jax.random.key(10)
    theta = jnp.abs(jax.random.normal(jax.random.fold_in(key, 0), (T, 5))) + 0.2
    theta = theta.at[:, 4].set(
        0.2 + 0.6 * jax.random.uniform(jax.random.fold_in(key, 1), (T,))
    )
    pulses = jnp.where(
        jax.random.uniform(jax.random.fold_in(key, 2), (T, 4)) < 0.5, 1.0, -1.0
    )
    cond = jnp.concatenate([theta, pulses], -1)
    rt = theta[:, 4] + (
        jax.random.randint(jax.random.fold_in(key, 3), (T,), 0, 12)
        + 0.03
        + 0.1 * jax.random.uniform(jax.random.fold_in(key, 4), (T,))
    ) * 0.1
    choice = jax.random.randint(jax.random.fold_in(key, 5), (T,), 0, 3)
    x = jnp.stack([rt, choice.astype(jnp.float32)], -1)

    ref = est.log_prob_fn(est.params, x, cond)
    got = fused(x, cond)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=3e-5,
                               atol=3e-5)

    def pot(fn, th):
        c = jnp.concatenate([jnp.broadcast_to(th, (T, 5)), pulses], -1)
        return jnp.sum(fn(x, c))

    th0 = theta[0]
    g_ref = jax.grad(lambda t: pot(
        lambda a, b: est.log_prob_fn(est.params, a, b), t))(th0)
    g_f = jax.grad(lambda t: pot(fused, t))(th0)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_ref), rtol=1e-4,
                               atol=1e-4)

    # vmapped over chains (the NUTS shape)
    ths = theta[:4]
    gv_ref = jax.vmap(jax.grad(lambda t: pot(
        lambda a, b: est.log_prob_fn(est.params, a, b), t)))(ths)
    gv_f = jax.vmap(jax.grad(lambda t: pot(fused, t)))(ths)
    np.testing.assert_allclose(np.asarray(gv_f), np.asarray(gv_ref),
                               rtol=1e-4, atol=1e-4)


def test_fused_shifted_log_value_and_grad_parity():
    """rt_rep="shifted_log": the fused path's outer transform (decision-time
    log + onset barrier, masked on censored rows) must match the XLA
    log_prob_fn in value and in theta-gradient (incl. through t_nd, which
    now enters the x-transform, not just the conditioning)."""
    cfg = MNLEConfig(
        condition_dim=9, num_categories=3, rt_rep="shifted_log",
        censor_rt=True, **SMALL,
    )
    est = build_mnle(jax.random.key(11), cfg)
    fused = make_fused_logprob(est, interpret=True)
    T = 13
    key = jax.random.key(12)
    theta = jnp.abs(jax.random.normal(jax.random.fold_in(key, 0), (T, 5))) + 0.2
    theta = theta.at[:, 4].set(
        0.2 + 0.6 * jax.random.uniform(jax.random.fold_in(key, 1), (T,))
    )
    pulses = jnp.where(
        jax.random.uniform(jax.random.fold_in(key, 2), (T, 4)) < 0.5, 1.0, -1.0
    )
    cond = jnp.concatenate([theta, pulses], -1)
    rt = theta[:, 4] + jnp.exp(
        -1.0 + 0.5 * jax.random.normal(jax.random.fold_in(key, 3), (T,))
    )
    choice = jax.random.randint(jax.random.fold_in(key, 5), (T,), 0, 3)
    x = jnp.stack([rt, choice.astype(jnp.float32)], -1)

    ref = est.log_prob_fn(est.params, x, cond)
    got = fused(x, cond)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=3e-5,
                               atol=3e-5)

    def pot(fn, th):
        c = jnp.concatenate([jnp.broadcast_to(th, (T, 5)), pulses], -1)
        return jnp.sum(fn(x, c))

    th0 = theta[0]
    g_ref = jax.grad(lambda t: pot(
        lambda a, b: est.log_prob_fn(est.params, a, b), t))(th0)
    g_f = jax.grad(lambda t: pot(fused, t))(th0)
    assert np.isfinite(np.asarray(g_f)).all()
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_ref), rtol=1e-4,
                               atol=1e-4)
