"""Pallas kernel CPU-CI coverage via the TPU *interpret* mode.

The flagship bench kernel (``ops/ddm_pallas.py``) previously ran only on real
TPU hardware (tests/test_pallas_tpu.py is skipped off-TPU), so its shapes,
layout, indexing, and while-loop semantics could regress silently on CPU-run
iterations. ``pltpu.InterpretParams`` emulates the whole Mosaic kernel —
including ``pltpu.prng_seed`` / ``prng_random_bits`` — on CPU, so every
``pytest tests/`` run now exercises it.

Determinism strategy: with ``mu_sensory=0`` the diffusion term vanishes and
both kernels follow the identical leak + pulse-kick recurrence (reference
rt_choice_model.py:186-204), so the Pallas output must match the XLA scan
kernel *exactly* (not just distributionally) — and match analytic hit times.
The HW-PRNG noise path itself is validated distributionally on TPU
(tests/test_pallas_tpu.py); here a smoke check only asserts it produces
finite, in-range output.

Small shapes keep the interpreter fast: t_max=0.8 s -> 1,600 steps,
tile_rows=8 -> one (8, 128) tile of 1,024 trials.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from sbi_for_diffusion_models_tpu.ops.ddm_pallas import ddm_rt_choice_pallas
from sbi_for_diffusion_models_tpu.ops.ddm_scan import ddm_rt_choice_scan

DT = 5e-4
T_MAX = 0.8  # 1600 steps, 8 pulses
N_MAX = 1600
SPP = 200
P = 8
INTERP = pltpu.InterpretParams()


def _run_both(theta, pulses, *, mu_sensory=0.0, collapse_rate=0.0, seed=0):
    common = dict(
        mu_sensory=mu_sensory,
        collapse_rate=collapse_rate,
        dt=DT,
        t_max=T_MAX,
        steps_per_pulse=SPP,
        n_max=N_MAX,
    )
    xp = np.asarray(
        ddm_rt_choice_pallas(
            theta,
            pulses,
            jax.random.key(seed),
            tile_rows=8,
            interpret=INTERP,
            **common,
        )
    )
    xs = np.asarray(
        ddm_rt_choice_scan(
            theta, pulses, jax.random.key(seed + 1), chunk_steps=SPP, **common
        )
    )
    return xp, xs


def test_zero_noise_pulse_integration_matches_scan_and_analytic():
    """lam=0, sigma=0: a accumulates v*s kicks only; hit time is analytic.

    a0 = 0.5*B = 5.0, v = 1.2, all pulses +1 -> needs ceil(5/1.2) = 5 kicks
    to reach B = 10; the 5th kick lands on step t = 4*200 = 800, recorded as
    hit_step = 801 (first-hit off-by-one, reference rt_choice_model.py:201).
    """
    N = 16
    theta = jnp.tile(jnp.asarray([[0.5, 0.0, 1.2, 10.0, 0.0]], jnp.float32), (N, 1))
    pulses = jnp.ones((N, P), jnp.float32)
    xp, xs = _run_both(theta, pulses)
    np.testing.assert_array_equal(xp, xs)
    np.testing.assert_allclose(xp[:, 0], 801 * DT, rtol=1e-6)
    np.testing.assert_array_equal(xp[:, 1], 1.0)


def test_zero_noise_lower_bound_choice_zero():
    """All pulses -1 drive a to the lower bound -> choice 0."""
    N = 16
    theta = jnp.tile(jnp.asarray([[0.5, 0.0, 1.5, 8.0, 0.0]], jnp.float32), (N, 1))
    pulses = -jnp.ones((N, P), jnp.float32)
    xp, xs = _run_both(theta, pulses)
    np.testing.assert_array_equal(xp, xs)
    np.testing.assert_array_equal(xp[:, 1], 0.0)


def test_zero_noise_censoring_and_t_nd_window():
    """v=0, sigma=0: never hits -> censored to choice 2 with
    rt = t_nd + n_steps*dt, n_steps = floor((t_max - t_nd)/dt)
    (reference rt_choice_model.py:141,206-218)."""
    # Values chosen off the exact step-boundary: when (t_max - t_nd)/dt is an
    # integer in real arithmetic (e.g. t_nd = 0), float32 rounding of the
    # quotient differs between numpy and XLA and the floor flips by one step.
    # The Pallas==scan array_equal below locks the boundary semantics; the
    # analytic check uses interior points.
    t_nds = np.asarray([0.0501, 0.1002, 0.3333, 0.7899], np.float32)
    theta = jnp.stack(
        [
            jnp.full((4,), 0.5),
            jnp.zeros((4,)),
            jnp.zeros((4,)),
            jnp.full((4,), 10.0),
            jnp.asarray(t_nds),
        ],
        axis=-1,
    )
    pulses = jnp.ones((4, P), jnp.float32)
    xp, xs = _run_both(theta, pulses)
    np.testing.assert_array_equal(xp, xs)
    np.testing.assert_array_equal(xp[:, 1], 2.0)
    # Window math in float32, as both kernels compute it (e.g. t_nd=0 gives
    # floor(0.8f/5e-4f) = 1599, not the float64 1600).
    n_steps = np.clip(
        np.floor(
            (np.float32(T_MAX) - t_nds) / np.float32(DT)
        ).astype(int),
        0,
        N_MAX,
    )
    expected_rt = np.clip(
        t_nds + n_steps.astype(np.float32) * np.float32(DT), 1e-6, T_MAX
    )
    np.testing.assert_allclose(xp[:, 0], expected_rt, rtol=1e-5)


def test_zero_noise_leak_trajectory_matches_scan():
    """lam>0 exercises the per-step leak arithmetic in both kernels."""
    N = 8
    theta = jnp.tile(jnp.asarray([[0.4, 2.0, 1.0, 6.0, 0.05]], jnp.float32), (N, 1))
    pulses = jnp.asarray(
        np.where(np.arange(P) % 2 == 0, 1.0, -1.0)[None].repeat(N, 0), jnp.float32
    )
    xp, xs = _run_both(theta, pulses)
    np.testing.assert_allclose(xp, xs, rtol=1e-6, atol=1e-6)


def test_zero_noise_collapsing_bounds_match_scan():
    """collapse_rate > 0: the time-dependent bound check must agree exactly
    with the scan kernel's ``bounds_at`` (same f(t) = 0.5 + 0.5*exp(-c*t))."""
    N = 8
    theta = jnp.tile(jnp.asarray([[0.55, 0.0, 0.0, 9.0, 0.0]], jnp.float32), (N, 1))
    pulses = jnp.ones((N, P), jnp.float32)
    xp, xs = _run_both(theta, pulses, collapse_rate=4.0)
    np.testing.assert_allclose(xp, xs, rtol=1e-6)
    # The collapsing upper bound must eventually absorb a static a > B/2.
    np.testing.assert_array_equal(xp[:, 1], 1.0)


def test_hw_prng_noise_path_runs_in_interpreter():
    """Noise path smoke check: the Box-Muller HW-PRNG code emits finite,
    in-range (rt, choice). The interpreter's PRNG emulation ignores
    ``prng_seed`` (fixed stream), so seed-sensitivity and distribution-level
    parity with the scan kernel are asserted on TPU in test_pallas_tpu.py."""
    N = 64
    theta = jnp.tile(jnp.asarray([[0.5, 0.5, 1.0, 4.0, 0.1]], jnp.float32), (N, 1))
    pulses = jnp.ones((N, P), jnp.float32)
    kw = dict(
        mu_sensory=1.0,
        dt=DT,
        t_max=T_MAX,
        steps_per_pulse=SPP,
        n_max=N_MAX,
        tile_rows=8,
        interpret=INTERP,
    )
    a = np.asarray(ddm_rt_choice_pallas(theta, pulses, jax.random.key(3), **kw))
    b = np.asarray(ddm_rt_choice_pallas(theta, pulses, jax.random.key(3), **kw))
    assert np.all(np.isfinite(a))
    assert set(np.unique(a[:, 1])) <= {0.0, 1.0, 2.0}
    assert np.all((a[:, 0] >= 1e-6) & (a[:, 0] <= T_MAX))
    np.testing.assert_array_equal(a, b)
