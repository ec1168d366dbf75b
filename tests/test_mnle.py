"""MNLE estimator: normalization, training, save/load round-trip."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sbi_for_diffusion_models_tpu.mnle import load_model, save_model, train_mnle
from sbi_for_diffusion_models_tpu.nets.mnle_net import MNLEConfig, build_mnle
from sbi_for_diffusion_models_tpu.run_config import RUN_CONFIG_PARAMS

SMALL = dict(hidden_features=32, num_transforms=3, num_bins=8)


@pytest.fixture(scope="module")
def untrained():
    cfg = MNLEConfig(condition_dim=4, num_categories=3, **SMALL)
    return build_mnle(jax.random.key(0), cfg)


def test_log_prob_normalizes(untrained):
    """Integral over rt x sum over choices of p(x|z) must be ~1."""
    est = untrained
    cond = jax.random.normal(jax.random.key(1), (4,))
    rts = jnp.linspace(1e-3, 60.0, 8000)
    total = 0.0
    for c in range(3):
        x = jnp.stack([rts, jnp.full_like(rts, c)], -1)
        lp = jax.jit(est.log_prob)(x, jnp.broadcast_to(cond, (rts.shape[0], 4)))
        total += jnp.trapezoid(jnp.exp(lp), rts)
    assert abs(float(total) - 1.0) < 0.02, f"density integrates to {float(total)}"


def test_training_learns_synthetic_likelihood():
    """Train on rt ~ LogNormal(0.5 z0, 0.3), choice ~ Bern(sigmoid(2 z1))."""
    key = jax.random.key(3)
    N, D = 3000, 4
    z = jax.random.normal(jax.random.fold_in(key, 0), (N, D))
    rt = jnp.exp(0.5 * z[:, 0] + 0.3 * jax.random.normal(jax.random.fold_in(key, 1), (N,)))
    choice = (
        jax.random.uniform(jax.random.fold_in(key, 2), (N,))
        < jax.nn.sigmoid(2.0 * z[:, 1])
    ).astype(jnp.float32)
    x = jnp.stack([rt, choice], -1)
    cfg = RUN_CONFIG_PARAMS.replace(
        TRAIN_BATCH_SIZE=500,
        TRAIN_MAX_EPOCHS=60,
        TRAIN_STOP_AFTER_EPOCHS=12,
        MNLE_HIDDEN_FEATURES=32,
        MNLE_NUM_TRANSFORMS=3,
        MNLE_NUM_BINS=8,
    )
    est = train_mnle(cfg, None, z, x, verbose=False)

    zt, xt = z[:200], x[:200]
    lp = jax.jit(est.log_prob)(xt, zt)
    mu_t = 0.5 * zt[:, 0]
    ln = (
        -jnp.log(xt[:, 0])
        - jnp.log(0.3)
        - 0.5 * math.log(2 * math.pi)
        - 0.5 * ((jnp.log(xt[:, 0]) - mu_t) / 0.3) ** 2
    )
    p1 = jax.nn.sigmoid(2.0 * zt[:, 1])
    cat = jnp.where(xt[:, 1] == 1, jnp.log(p1), jnp.log1p(-p1))
    true_lp = ln + cat
    corr = float(jnp.corrcoef(lp, true_lp)[0, 1])
    assert corr > 0.8, f"learned log-lik poorly correlated with truth: {corr}"


def test_sample_roundtrip(untrained):
    est = untrained
    cond = jnp.zeros((512, 4))
    samp = jax.jit(est.sample)(jax.random.key(5), cond)
    assert samp.shape == (512, 2)
    assert bool(jnp.all(samp[:, 0] > 0))  # rt positive after exp
    assert set(np.unique(np.asarray(samp[:, 1]))) <= {0.0, 1.0, 2.0}


def test_save_load_roundtrip(tmp_path, untrained, monkeypatch):
    monkeypatch.setenv("MODEL_DIR", str(tmp_path))
    save_model(untrained, RUN_CONFIG_PARAMS)
    est2 = load_model()
    x = jnp.array([[0.5, 1.0], [2.0, 0.0]])
    c = jnp.zeros((2, 4))
    np.testing.assert_allclose(
        np.asarray(untrained.log_prob(x, c)),
        np.asarray(est2.log_prob(x, c)),
        rtol=1e-6,
    )
