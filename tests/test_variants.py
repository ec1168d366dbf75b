"""Model variants: collapsing bounds, 7-param DDM, rat-data packing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sbi_for_diffusion_models_tpu.datasets import make_x_from_rat_df, split_by_subject
from sbi_for_diffusion_models_tpu.models.pulse_ddm_7p import (
    rt_choice_model_simulator_7p,
    simulate_session_data_7p,
)
from sbi_for_diffusion_models_tpu.models.rt_choice_model import (
    rt_choice_model_simulator_torch,
)
from sbi_for_diffusion_models_tpu.ops.ddm_scan import ddm_rt_choice_scan

SIM_KW = dict(n_max=200, steps_per_pulse=20, chunk_steps=20, t_max=8.0)


def test_collapsing_bounds_shorten_rts():
    """With collapsing bounds, censored fraction and RTs must drop."""
    N = 512
    theta = jnp.tile(jnp.array([[0.5, 0.1, 0.05, 8.0, 0.0]], jnp.float32), (N, 1))
    pulses = jnp.zeros((N, 10), jnp.float32) + 1.0
    fixed = np.asarray(
        ddm_rt_choice_scan(theta, pulses, jax.random.key(0), collapse_rate=0.0, **SIM_KW)
    )
    collapsing = np.asarray(
        ddm_rt_choice_scan(theta, pulses, jax.random.key(0), collapse_rate=50.0, **SIM_KW)
    )
    assert collapsing[:, 0].mean() < fixed[:, 0].mean()
    assert (collapsing[:, 1] == 2).mean() <= (fixed[:, 1] == 2).mean()


def test_7p_shapes_and_reduction_to_5p():
    """sigma_s=0 and sigma_a=1 gives the 5-param model's distribution."""
    N = 2048
    base5 = jnp.tile(jnp.array([[0.5, 0.3, 1.0, 6.0, 0.1]], jnp.float32), (N, 1))
    theta7 = jnp.concatenate(
        [
            base5[:, :4],
            jnp.ones((N, 1)),  # sigma_a = 1 == mu_sensory default
            base5[:, 4:5],
            jnp.zeros((N, 1)),  # sigma_s = 0 -> clean pulses
        ],
        axis=-1,
    )
    s = jnp.where(jax.random.uniform(jax.random.key(1), (N, 80)) < 0.75, 1.0, -1.0)
    x7 = np.asarray(rt_choice_model_simulator_7p(theta7, rng=2, pulse_sides=s))
    x5 = np.asarray(rt_choice_model_simulator_torch(base5, rng=3, pulse_sides=s))
    assert x7.shape == (N, 2)
    # Distributional agreement (different RNG streams): choice fractions and
    # median RT within tolerance.
    f7 = np.bincount(x7[:, 1].astype(int), minlength=3) / N
    f5 = np.bincount(x5[:, 1].astype(int), minlength=3) / N
    np.testing.assert_allclose(f7, f5, atol=0.05)
    np.testing.assert_allclose(
        np.median(x7[:, 0]), np.median(x5[:, 0]), rtol=0.15
    )


def test_7p_sensory_noise_changes_behavior():
    N = 2048
    theta = jnp.tile(
        jnp.array([[0.5, 0.3, 1.0, 6.0, 1.0, 0.1, 0.0]], jnp.float32), (N, 1)
    )
    theta_noisy = theta.at[:, 6].set(3.0)
    s = jnp.where(jax.random.uniform(jax.random.key(1), (N, 80)) < 0.9, 1.0, -1.0)
    clean = np.asarray(rt_choice_model_simulator_7p(theta, rng=2, pulse_sides=s))
    noisy = np.asarray(rt_choice_model_simulator_7p(theta_noisy, rng=2, pulse_sides=s))
    # Strong sensory noise destroys the stimulus information: accuracy
    # (fraction matching the 90%-up stimulus) must fall.
    assert (noisy[:, 1] == 1).mean() < (clean[:, 1] == 1).mean()


def test_7p_session_and_validation():
    x, pulses = simulate_session_data_7p(
        jnp.array([0.5, 0.3, 1.0, 6.0, 1.0, 0.1, 0.5]), 16, rng=0,
        return_pulse_sides=True,
    )
    assert x.shape == (16, 2) and pulses.shape[0] == 16
    with pytest.raises(ValueError, match="7"):
        rt_choice_model_simulator_7p(jnp.zeros((4, 5)), rng=0)


def test_make_x_from_rat_df_dict_and_subjects():
    df = {
        "rt": np.array([0.5, 1.2, np.nan, 0.0, 2.0]),
        "choice": np.array([0.0, 1.0, 1.0, 2.0, 1.0]),
        "subject": np.array([1, 1, 1, 2, 2]),
    }
    x = make_x_from_rat_df(df)
    assert x.shape == (4, 2)  # NaN row dropped
    assert float(x[2, 0]) >= 1e-7  # clamped zero RT (float32 1e-6)
    ids, xs = split_by_subject(df)
    assert ids == [1, 2]
    assert xs[0].shape[0] == 2 and xs[1].shape[0] == 2
    with pytest.raises(ValueError, match="choice"):
        make_x_from_rat_df({"rt": np.ones(3), "choice": np.array([0.0, 5.0, 1.0])})


def test_make_x_log_rt():
    df = {"rt": np.array([1.0, np.e]), "choice": np.array([0.0, 1.0])}
    x = make_x_from_rat_df(df, log_rt=True)
    np.testing.assert_allclose(np.asarray(x[:, 0]), [0.0, 1.0], atol=1e-6)
