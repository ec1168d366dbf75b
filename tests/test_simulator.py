"""Unit tests for the pulse-DDM scan kernel.

Covers the reference-semantics lock points called out in SURVEY.md section 7:
analytic hit-times under deterministic drift, zero-noise pulse integration,
censoring edge cases, t_nd window math, first-hit off-by-one, and a
distributional parity check against an independent NumPy Euler-Maruyama
oracle implemented here (NOT copied from the reference).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sbi_for_diffusion_models_tpu.constants import DT_CHOICE, T_MAX
from sbi_for_diffusion_models_tpu.models.rt_choice_model import (
    generate_pulse_matrix,
    generate_pulse_matrix_numpy,
    n_pulses_max_from_schedule,
    pack_x_rt_choice,
    pulse_schedule,
    rt_choice_model_simulator,
    rt_choice_model_simulator_torch,
    simulate_session_data_rt_choice,
)
from sbi_for_diffusion_models_tpu.models.choice_model import (
    choice_model_simulator_torch,
    generate_pulse_sides,
)

DT = float(DT_CHOICE)
N_MAX, SPP = pulse_schedule()
P = n_pulses_max_from_schedule(N_MAX, SPP)


def theta_row(a0=0.5, lam=0.0, v=1.0, B=10.0, t_nd=0.0):
    return jnp.array([[a0, lam, v, B, t_nd]], jnp.float32)


def ones_stim(n, sign=1.0):
    return sign * jnp.ones((n, P), jnp.float32)


def test_schedule():
    assert (N_MAX, SPP) == (16000, 200)
    assert P == 80


def test_deterministic_pulse_hit_time():
    # sigma=0, lam=0, all pulses +1: a after k-th pulse = a0*B + k*v.
    # a0=0.5*B=5, v=1, B=10 -> hits at the 5th pulse, t=4*200=800, hit_step=801.
    x = rt_choice_model_simulator_torch(
        theta_row(a0=0.5, v=1.0, B=10.0),
        mu_sensory=0.0,
        pulse_sides=ones_stim(1),
    )
    assert int(x[0, 1]) == 1
    np.testing.assert_allclose(float(x[0, 0]), 801 * DT, rtol=1e-6)


def test_deterministic_lower_bound():
    x = rt_choice_model_simulator_torch(
        theta_row(a0=0.5, v=1.0, B=10.0),
        mu_sensory=0.0,
        pulse_sides=ones_stim(1, sign=-1.0),
    )
    assert int(x[0, 1]) == 0
    np.testing.assert_allclose(float(x[0, 0]), 801 * DT, rtol=1e-6)


def test_censoring_no_drift():
    # v=0, sigma=0, a0 strictly inside -> never hits -> choice 2, rt at the
    # window end. Note: in float32, floor((8.0-0)/5e-4) = 15999 (not 16000);
    # torch produces the identical value, so this locks reference parity.
    x = rt_choice_model_simulator_torch(
        theta_row(a0=0.5, v=0.0, B=10.0),
        mu_sensory=0.0,
        pulse_sides=ones_stim(1),
    )
    assert int(x[0, 1]) == 2
    np.testing.assert_allclose(float(x[0, 0]), 15999 * DT, rtol=1e-6)


def test_a0_zero_hits_lower_immediately():
    # a0_frac=0 -> a=0; first step leaves a at 0 (lam*0=0, no noise), and the
    # bound check a<=0 fires at t=0 -> hit_step=1, rt=t_nd+dt.
    x = rt_choice_model_simulator_torch(
        theta_row(a0=0.0, v=0.0, B=10.0),
        mu_sensory=0.0,
        pulse_sides=ones_stim(1),
    )
    assert int(x[0, 1]) == 0
    np.testing.assert_allclose(float(x[0, 0]), DT, rtol=1e-5)


def test_tnd_window_math():
    # t_nd = T_MAX - 1.5*dt -> n_steps = floor(1.5) = 1 active step.
    # Huge v: pulse at t=0 hits -> hit_step=1, rt = t_nd + dt <= T_MAX.
    t_nd = T_MAX - 1.5 * DT
    x = rt_choice_model_simulator_torch(
        theta_row(a0=0.5, v=100.0, B=10.0, t_nd=t_nd),
        mu_sensory=0.0,
        pulse_sides=ones_stim(1),
    )
    assert int(x[0, 1]) == 1
    np.testing.assert_allclose(float(x[0, 0]), t_nd + DT, rtol=1e-6)

    # t_nd so large the window is 0 steps -> never active -> censored,
    # hit_step = n_steps = 0, rt = clip(t_nd) (cannot exceed T_MAX).
    t_nd2 = T_MAX - 0.5 * DT
    x2 = rt_choice_model_simulator_torch(
        theta_row(a0=0.5, v=100.0, B=10.0, t_nd=t_nd2),
        mu_sensory=0.0,
        pulse_sides=ones_stim(1),
    )
    assert int(x2[0, 1]) == 2
    np.testing.assert_allclose(float(x2[0, 0]), t_nd2, rtol=1e-6)


def test_param_sanitation():
    # Negative v and B are folded to |.|; theta outside ranges clipped.
    x = rt_choice_model_simulator_torch(
        jnp.array([[2.0, 0.0, -1.0, -10.0, -3.0]], jnp.float32),
        mu_sensory=0.0,
        pulse_sides=ones_stim(1),
    )
    # a0 clipped to 1 -> a = B -> hits upper at first step's bound check.
    assert int(x[0, 1]) == 1


def test_stimulus_broadcast_and_truncation():
    # Single stimulus row broadcasts across the batch; longer-than-needed
    # stimulus is tail-truncated.
    s = jnp.ones((1, P + 13), jnp.float32)
    x = rt_choice_model_simulator_torch(
        jnp.tile(theta_row(), (4, 1)), mu_sensory=0.0, pulse_sides=s
    )
    assert x.shape == (4, 2)
    assert np.all(np.asarray(x[:, 1]) == 1)

    with pytest.raises(ValueError):
        rt_choice_model_simulator_torch(
            theta_row(), mu_sensory=0.0, pulse_sides=jnp.ones((1, P - 1))
        )
    with pytest.raises(ValueError):
        rt_choice_model_simulator_torch(
            jnp.tile(theta_row(), (3, 1)),
            mu_sensory=0.0,
            pulse_sides=jnp.ones((2, P)),
        )


def test_determinism_and_key_sensitivity():
    theta = jnp.tile(theta_row(v=0.5, B=3.0), (64, 1))
    s = ones_stim(64)
    x1 = rt_choice_model_simulator_torch(theta, rng=0, pulse_sides=s)
    x2 = rt_choice_model_simulator_torch(theta, rng=0, pulse_sides=s)
    x3 = rt_choice_model_simulator_torch(theta, rng=1, pulse_sides=s)
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
    assert not np.array_equal(np.asarray(x1), np.asarray(x3))


def test_single_trial_api():
    rt, choice = rt_choice_model_simulator(
        np.array([0.5, 0.1, 1.0, 5.0, 0.2]), np.random.default_rng(0)
    )
    assert isinstance(rt, float) and isinstance(choice, int)
    assert 0.0 < rt <= T_MAX
    assert choice in (0, 1, 2)


def test_pulse_matrix_distribution():
    rng = np.random.default_rng(0)
    s = generate_pulse_matrix_numpy(rng, 4000, P, p_success=0.75)
    assert s.shape == (4000, P)
    assert set(np.unique(s)) == {-1.0, 1.0}
    # Each trial's majority side should match its correct side w.p. ~p_success.
    correct = np.sign(s.sum(axis=1))
    match_frac = (s == correct[:, None]).mean()
    assert abs(match_frac - 0.75) < 0.02
    # Correct side is balanced 50/50.
    assert abs((correct > 0).mean() - 0.5) < 0.05

    s_dev = generate_pulse_matrix(jax.random.key(0), 4000, P, p_success=0.75)
    m = np.asarray(s_dev)
    assert set(np.unique(m)) == {-1.0, 1.0}
    frac_dev = (m == np.sign(m.sum(1))[:, None]).mean()
    assert abs(frac_dev - 0.75) < 0.02


def test_generate_pulse_sides_single():
    rng = np.random.default_rng(3)
    s = generate_pulse_sides(rng, 80, p_success=1.0)
    assert set(np.unique(s)) <= {-1.0, 1.0}
    assert len(set(np.unique(s))) == 1  # all pulses match the correct side
    assert generate_pulse_sides(rng, 0).shape == (0,)


def test_pack_x():
    x = jnp.array([[0.5, 1.0], [1e-9, 2.0]], jnp.float32)
    packed = pack_x_rt_choice(x, log_rt=False)
    np.testing.assert_allclose(np.asarray(packed[:, 0]), [0.5, 1e-6])
    packed_log = pack_x_rt_choice(x, log_rt=True)
    np.testing.assert_allclose(
        np.asarray(packed_log[:, 0]), np.log([0.5, 1e-6]), rtol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(packed[:, 1]), [1.0, 2.0])


def test_session_api():
    x, s = simulate_session_data_rt_choice(
        jnp.array([0.5, 0.2, 1.0, 5.0, 0.1]), 32, rng=0, return_pulse_sides=True
    )
    assert x.shape == (32, 2)
    assert s.shape == (32, P)
    assert np.all(np.isfinite(np.asarray(x)))


def test_collapsing_bound_forces_decisions():
    # Strong collapse: bounds meet at the midline, so every trial decides and
    # decides earlier than the fixed-bound model.
    theta = jnp.tile(theta_row(a0=0.5, v=0.0, B=10.0), (128, 1))
    s = ones_stim(128)
    x_fixed = rt_choice_model_simulator_torch(
        theta, rng=0, mu_sensory=0.3, pulse_sides=s, collapse_rate=0.0
    )
    x_coll = rt_choice_model_simulator_torch(
        theta, rng=0, mu_sensory=0.3, pulse_sides=s, collapse_rate=2.0
    )
    assert np.all(np.asarray(x_coll[:, 1]) != 2)
    assert np.asarray(x_coll[:, 0]).mean() < np.asarray(x_fixed[:, 0]).mean()


def test_choice_model_resampling():
    # v=0, small noise, huge bound -> everything invalid without resampling.
    theta = jnp.tile(
        jnp.array([[0.5, 0.0, 0.0, 50.0, 0.0]], jnp.float32), (16, 1)
    )
    out = choice_model_simulator_torch(theta, rng=0, mu_sensory=0.01)
    assert np.all(np.asarray(out) == -1.0)
    # Reachable bound + resampling -> valid choices.
    theta2 = jnp.tile(
        jnp.array([[0.5, 0.0, 1.0, 3.0, 0.0]], jnp.float32), (16, 1)
    )
    out2 = choice_model_simulator_torch(
        theta2, rng=0, mu_sensory=1.0, resample_invalid=True, max_resamples=10
    )
    vals = set(np.unique(np.asarray(out2)))
    assert vals <= {0.0, 1.0}


# ---------------------------------------------------------------------------
# Distributional parity against an independent NumPy oracle
# ---------------------------------------------------------------------------
def numpy_oracle(theta, s, sigma, seed, n_max=N_MAX, spp=SPP, dt=DT):
    """Straightforward NumPy Euler-Maruyama implementation of the same model,
    written independently as the correctness oracle."""
    rng = np.random.default_rng(seed)
    theta = np.asarray(theta, np.float64)
    N = theta.shape[0]
    a0 = np.clip(theta[:, 0], 0, 1) * np.maximum(np.abs(theta[:, 3]), 1e-6)
    lam = theta[:, 1]
    v = np.abs(theta[:, 2])
    B = np.maximum(np.abs(theta[:, 3]), 1e-6)
    t_nd = np.clip(theta[:, 4], 0, T_MAX - 1e-6)
    n_steps = np.clip(np.floor((T_MAX - t_nd) / dt).astype(int), 0, n_max)

    a = a0.copy()
    hit = np.zeros(N, bool)
    choice = np.zeros(N, int)
    hit_step = np.zeros(N, int)
    sq = np.sqrt(dt)
    for t in range(n_max):
        active = (~hit) & (t < n_steps)
        if not active.any():
            break
        a = a + (-lam * a) * dt + rng.normal(0, 1, N) * sigma * sq
        if t % spp == 0:
            a = a + v * s[:, t // spp] * active
        up = active & (a >= B)
        lo = active & (a <= 0)
        newly = up | lo
        hit_step[newly] = t + 1
        choice[up] = 1
        choice[lo] = 0
        hit |= newly
    hit_step[~hit] = n_steps[~hit]
    out = np.where(hit, choice, 2)
    rt = np.clip(t_nd + hit_step * dt, 1e-6, T_MAX)
    return np.stack([rt, out.astype(float)], axis=1)


def test_distributional_parity_vs_numpy_oracle():
    N = 3000
    theta = np.tile([0.4, 0.5, 1.5, 8.0, 0.3], (N, 1)).astype(np.float32)
    rng = np.random.default_rng(42)
    s = generate_pulse_matrix_numpy(rng, N, P, p_success=0.75)

    x_ref = numpy_oracle(theta, s, sigma=1.0, seed=1)
    x_jax = np.asarray(
        rt_choice_model_simulator_torch(theta, rng=2, pulse_sides=s)
    )

    # Choice fractions match within sampling error.
    for c in (0, 1, 2):
        f_ref = (x_ref[:, 1] == c).mean()
        f_jax = (x_jax[:, 1] == c).mean()
        assert abs(f_ref - f_jax) < 0.04, (c, f_ref, f_jax)

    # RT quantiles of decided trials match.
    rt_ref = x_ref[x_ref[:, 1] != 2, 0]
    rt_jax = x_jax[x_jax[:, 1] != 2, 0]
    for q in (0.1, 0.25, 0.5, 0.75, 0.9):
        qr, qj = np.quantile(rt_ref, q), np.quantile(rt_jax, q)
        assert abs(qr - qj) < 0.12 * max(qr, 0.2), (q, qr, qj)
