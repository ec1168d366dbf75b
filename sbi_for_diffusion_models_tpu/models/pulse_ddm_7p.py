"""7-parameter pulse-DDM variant: theta = [a0, lam, nu, B, sigma_a, t_nd, sigma_s].

The reference explored this richer parameterization in its notebook workflow
(reference: src/notebooks/pulse_ddm_model.ipynb cell 4 — 7-parameter prior
with accumulator noise sigma_a and per-pulse sensory noise sigma_s) but never
promoted it into the package (the notebook imports a deleted
``ddm_simulator`` module). This module makes it a first-class simulator:

* ``sigma_a`` replaces the global ``mu_sensory`` as a *per-trial* diffusion
  noise scale;
* ``sigma_s`` corrupts each pulse: the kick uses s_eff = s + sigma_s * eta,
  eta ~ N(0, 1) per (trial, pulse) — sensory noise on the evidence stream.

Everything else (leak, bounds, censoring, RT convention) is exactly the
5-param reference math, reusing the same scan kernel.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import T_MAX
from ..ops.ddm_scan import ddm_rt_choice_scan
from ..run_config import RUN_CONFIG_PARAMS
from ..utils.rng import as_key
from .rt_choice_model import (
    as_pulse_tensor,
    generate_pulse_matrix,
    n_pulses_max_from_schedule,
    pulse_schedule,
)

cfg = RUN_CONFIG_PARAMS

ArrayLike = Union[np.ndarray, jnp.ndarray]

__all__ = ["rt_choice_model_simulator_7p", "simulate_session_data_7p"]


def rt_choice_model_simulator_7p(
    theta: ArrayLike,
    rng=None,
    *,
    pulse_sides: Optional[ArrayLike] = None,
    p_success: float = cfg.P_SUCCESS,
    collapse_rate: float = 0.0,
) -> jnp.ndarray:
    """Batched 7-param simulator. theta: (N, 7) or (7,)
    [a0, lam, nu, B, sigma_a, t_nd, sigma_s]. Returns (N, 2) [rt, choice]."""
    theta = jnp.asarray(theta, jnp.float32)
    if theta.ndim == 1:
        theta = theta.reshape(1, -1)
    if theta.shape[-1] != 7:
        raise ValueError(
            f"Expected theta shape (N,7) or (7,), got {tuple(theta.shape)}"
        )
    key = as_key(rng)
    N = theta.shape[0]
    n_max, spp = pulse_schedule()
    P = n_pulses_max_from_schedule(n_max, spp)

    if pulse_sides is None:
        s = generate_pulse_matrix(
            jax.random.fold_in(key, 1), N, P, p_success=p_success
        )
    else:
        s = as_pulse_tensor(pulse_sides)
        if s.shape[0] == 1 and N > 1:
            s = jnp.broadcast_to(s, (N, s.shape[1]))
        if s.shape[1] < P:
            raise ValueError(
                f"pulse_sides has P={s.shape[1]} pulses but simulator needs at "
                f"least {P} for T_MAX={T_MAX}s"
            )
        s = s[:, :P]

    sigma_a = jnp.abs(theta[:, 4])
    sigma_s = jnp.abs(theta[:, 6])
    # Sensory noise on the evidence stream: each pulse's effective side is
    # s + sigma_s * eta (notebook parameterization).
    eta = jax.random.normal(jax.random.fold_in(key, 2), s.shape, jnp.float32)
    s_eff = s + sigma_s[:, None] * eta

    theta5 = jnp.stack(
        [theta[:, 0], theta[:, 1], theta[:, 2], theta[:, 3], theta[:, 5]], axis=-1
    )
    return ddm_rt_choice_scan(
        theta5,
        s_eff,
        jax.random.fold_in(key, 0),
        mu_sensory=sigma_a,
        collapse_rate=float(collapse_rate),
        steps_per_pulse=spp,
        chunk_steps=min(cfg.SIM_CHUNK_STEPS, spp),
        n_max=n_max,
    )


def simulate_session_data_7p(
    theta_true: ArrayLike,
    num_trials: int,
    rng=None,
    *,
    p_success: float = cfg.P_SUCCESS,
    return_pulse_sides: bool = False,
) -> Union[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """IID session under one 7-param theta; mirrors
    ``simulate_session_data_rt_choice``."""
    key = as_key(rng)
    theta_true = jnp.asarray(theta_true, jnp.float32).reshape(1, -1)
    theta_rep = jnp.broadcast_to(theta_true, (int(num_trials), theta_true.shape[1]))
    n_max, spp = pulse_schedule()
    P = n_pulses_max_from_schedule(n_max, spp)
    pulses = generate_pulse_matrix(
        jax.random.fold_in(key, 7), int(num_trials), P, p_success=p_success
    )
    x = rt_choice_model_simulator_7p(
        theta_rep, rng=jax.random.fold_in(key, 8), pulse_sides=pulses
    )
    if return_pulse_sides:
        return x, pulses
    return x
