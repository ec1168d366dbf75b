"""Training checkpoint/resume: round-trip, fingerprint guard, train resume."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from sbi_for_diffusion_models_tpu.nets.mnle_net import MNLEConfig, build_mnle
from sbi_for_diffusion_models_tpu.run_config import RUN_CONFIG_PARAMS
from sbi_for_diffusion_models_tpu.utils.checkpoint import (
    config_fingerprint,
    latest_step,
    restore_train_state,
    save_train_state,
)


def _state():
    est = build_mnle(
        jax.random.key(0),
        MNLEConfig(condition_dim=4, hidden_features=8, num_transforms=2, num_bins=4),
    )
    tx = optax.adam(1e-3)
    return est.params, tx.init(est.params)


def test_roundtrip(tmp_path):
    params, opt_state = _state()
    key = jax.random.key(42)
    save_train_state(tmp_path / "ckpt", 3, params, opt_state, key, cfg=RUN_CONFIG_PARAMS)
    assert latest_step(tmp_path / "ckpt") == 3
    abstract = {
        "params": params,
        "opt_state": opt_state,
        "key": jax.random.key_data(key),
        "meta": {"step": np.asarray(0, np.int64)},
    }
    restored = restore_train_state(tmp_path / "ckpt", abstract, cfg=RUN_CONFIG_PARAMS)
    assert int(restored["meta"]["step"]) == 3
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert jax.random.key_data(restored["key"]).tolist() == jax.random.key_data(key).tolist()


def test_missing_returns_none(tmp_path):
    assert restore_train_state(tmp_path / "nope", {}) is None
    assert latest_step(tmp_path / "nope") is None


def test_fingerprint_guard(tmp_path):
    params, opt_state = _state()
    save_train_state(
        tmp_path / "ckpt", 0, params, opt_state, jax.random.key(0),
        cfg=RUN_CONFIG_PARAMS,
    )
    other = RUN_CONFIG_PARAMS.replace(TRAIN_LEARNING_RATE=99.0)
    assert config_fingerprint(other) != config_fingerprint(RUN_CONFIG_PARAMS)
    abstract = {
        "params": params,
        "opt_state": opt_state,
        "key": jax.random.key_data(jax.random.key(0)),
        "meta": {"step": np.asarray(0, np.int64)},
    }
    with pytest.raises(ValueError, match="different"):
        restore_train_state(tmp_path / "ckpt", abstract, cfg=other)
