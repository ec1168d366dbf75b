"""Choice-only pulse-DDM (legacy/simpler variant; reference
src/sbi_for_diffusion_models/models/choice_model.py).

Emits only choice in {-1 (invalid), 0, 1}; optional rejection-resampling of
invalid trials. Used by the reference's SNPE/SNLE notebook experiments.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Union

import jax.numpy as jnp
import numpy as np

from ..constants import T_MAX
from ..ops.ddm_scan import ddm_choice_scan
from ..run_config import RUN_CONFIG_PARAMS
from ..utils.rng import as_key

cfg = RUN_CONFIG_PARAMS

ArrayLike = Union[np.ndarray, jnp.ndarray]


@dataclass(frozen=True)
class ChoiceModelParams:
    """Named scalar parameters (reference choice_model.py:14-41)."""

    a0_frac: float
    lam: float
    v: float
    B: float
    t_nd: float

    @staticmethod
    def from_theta(theta: np.ndarray) -> "ChoiceModelParams":
        if theta.shape[-1] != 5:
            raise ValueError(
                f"Expected theta with 5 params [a0, lam, v, B, t_nd], got shape {theta.shape}."
            )
        a0, lam, v, B, t_nd = np.asarray(theta, dtype=np.float64)

        B = float(abs(B)) if np.isfinite(B) else 1.0
        B = max(B, 1e-6)
        a0 = float(np.clip(a0, 0.0, 1.0)) if np.isfinite(a0) else 0.5
        lam = float(lam) if np.isfinite(lam) else 0.0
        v = float(v) if np.isfinite(v) else 0.0
        t_nd = float(t_nd) if np.isfinite(t_nd) else 0.0
        t_nd = float(np.clip(t_nd, 0.0, T_MAX - 1e-6))
        return ChoiceModelParams(a0_frac=a0, lam=lam, v=v, B=B, t_nd=t_nd)


def generate_pulse_sides(
    rng: np.random.Generator,
    n_pulses: int,
    *,
    p_success: float = cfg.P_SUCCESS,
) -> np.ndarray:
    """Single-trial stimulus sequence s in {+1,-1}^n_pulses
    (reference choice_model.py:43-60): correct side 50/50, each pulse matches
    it with probability p_success."""
    if n_pulses <= 0:
        return np.zeros((0,), dtype=np.float32)
    p_success = float(np.clip(p_success, 0.0, 1.0))
    correct_side = 1.0 if rng.random() < 0.5 else -1.0
    is_correct = rng.random(size=n_pulses) < p_success
    return np.where(is_correct, correct_side, -correct_side).astype(np.float32)


def choice_model_simulator(
    theta: np.ndarray,
    rng: np.random.Generator,
    *,
    mu_sensory: float = 1.0,
    p_success: float = cfg.P_SUCCESS,
) -> int:
    """Single-trial NumPy API; returns {-1,0,1} (reference choice_model.py:192-211)."""
    th = jnp.asarray(theta, jnp.float32).reshape(1, 5)
    out = ddm_choice_scan(
        th,
        as_key(rng),
        mu_sensory=float(mu_sensory),
        p_success=float(p_success),
        max_resamples=0,
    )
    return int(out[0])


def choice_model_simulator_torch(
    theta: ArrayLike,
    rng=None,
    *,
    mu_sensory: float = 1.0,
    p_success: float = cfg.P_SUCCESS,
    resample_invalid: bool = False,
    max_resamples: int = 50,
) -> jnp.ndarray:
    """Batched choice-only simulator (reference choice_model.py:214-250).

    theta: (N,5) or (5,); returns (N,1) float32 in {0.,1.} (or -1. invalid).
    With ``resample_invalid=True`` invalid trials are re-run with fresh noise
    and stimulus up to ``max_resamples`` passes.
    """
    theta = jnp.asarray(theta, jnp.float32)
    if theta.ndim == 1:
        theta = theta.reshape(1, -1)
    if theta.shape[-1] != 5:
        raise ValueError(
            f"Expected theta shape (N,5) or (5,), got {tuple(theta.shape)}"
        )
    out = ddm_choice_scan(
        theta,
        as_key(rng),
        mu_sensory=float(mu_sensory),
        p_success=float(p_success),
        max_resamples=int(max_resamples) if resample_invalid else 0,
    )
    return out.astype(jnp.float32).reshape(-1, 1)
