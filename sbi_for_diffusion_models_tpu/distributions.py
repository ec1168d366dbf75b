"""Minimal, pure-JAX distribution & bijector library.

The reference delegates priors to ``torch.distributions`` and the
constrained->unconstrained MCMC bijection to ``sbi.utils.mcmc_transform``
(reference: rt_choice_model_pipeline.py:34-46, mnle.py:75). No probabilistic
JAX library is vendored in this environment, so the framework owns these
pieces: every distribution is a pytree-free object whose ``sample``/``log_prob``
are pure functions safe to close over under ``jit``/``vmap``.

Conventions
-----------
* ``sample(key, sample_shape=())`` returns ``(*sample_shape, *event_shape)``.
* ``log_prob(x)`` accepts ``(..., *event_shape)`` and returns ``(...)`` with
  event dimensions summed (matching torch ``Independent`` semantics used by
  ``MultipleIndependent``).
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln

__all__ = [
    "Distribution",
    "Beta",
    "LogNormal",
    "Normal",
    "Uniform",
    "MultipleIndependent",
    "BoxUniform",
    "Support",
    "real_support",
    "positive_support",
    "interval_support",
    "Bijector",
    "mcmc_transform",
]

_LOG_SQRT_2PI = 0.5 * math.log(2.0 * math.pi)


# ---------------------------------------------------------------------------
# Supports
# ---------------------------------------------------------------------------
class Support:
    """Constraint descriptor used to derive the MCMC bijection."""

    kind: str = "real"

    def __init__(self, lo: float | None = None, hi: float | None = None):
        self.lo = lo
        self.hi = hi

    def __repr__(self):
        return f"Support({self.kind}, lo={self.lo}, hi={self.hi})"


def real_support() -> Support:
    s = Support()
    s.kind = "real"
    return s


def positive_support() -> Support:
    s = Support(lo=0.0)
    s.kind = "positive"
    return s


def interval_support(lo: float, hi: float) -> Support:
    s = Support(lo=lo, hi=hi)
    s.kind = "interval"
    return s


# ---------------------------------------------------------------------------
# Distributions
# ---------------------------------------------------------------------------
class Distribution:
    """Base class. Subclasses define scalar-marginal math; event_shape=(d,)."""

    event_shape: tuple

    @property
    def event_dim(self) -> int:
        return int(self.event_shape[0]) if self.event_shape else 1

    def sample(self, key, sample_shape=()):  # pragma: no cover - interface
        raise NotImplementedError

    def log_prob(self, x):  # pragma: no cover - interface
        raise NotImplementedError

    def supports(self) -> list[Support]:
        """One Support per event dimension."""
        raise NotImplementedError


def _as_param(v) -> jnp.ndarray:
    """Normalize scalar / (d,) parameter to a 1-D float32 array."""
    arr = jnp.asarray(v, dtype=jnp.float32)
    return arr.reshape(-1) if arr.ndim > 0 else arr.reshape(1)


class Beta(Distribution):
    def __init__(self, concentration1, concentration0):
        self.a = _as_param(concentration1)
        self.b = _as_param(concentration0)
        self.event_shape = self.a.shape

    def sample(self, key, sample_shape=()):
        return jax.random.beta(
            key, self.a, self.b, shape=tuple(sample_shape) + self.a.shape
        )

    def log_prob(self, x):
        a, b = self.a, self.b
        xc = jnp.clip(x, 1e-37, 1.0 - 1e-7)
        lp = (
            (a - 1.0) * jnp.log(xc)
            + (b - 1.0) * jnp.log1p(-xc)
            - (gammaln(a) + gammaln(b) - gammaln(a + b))
        )
        inside = (x > 0.0) & (x < 1.0)
        lp = jnp.where(inside, lp, -jnp.inf)
        return lp.sum(-1)

    def supports(self):
        return [interval_support(0.0, 1.0) for _ in range(self.event_dim)]


class LogNormal(Distribution):
    def __init__(self, loc, scale):
        self.mu = _as_param(loc)
        self.sigma = _as_param(scale)
        self.event_shape = self.mu.shape

    def sample(self, key, sample_shape=()):
        eps = jax.random.normal(key, tuple(sample_shape) + self.mu.shape)
        return jnp.exp(self.mu + self.sigma * eps)

    def log_prob(self, x):
        xc = jnp.clip(x, 1e-37, None)
        logx = jnp.log(xc)
        lp = (
            -logx
            - jnp.log(self.sigma)
            - _LOG_SQRT_2PI
            - 0.5 * ((logx - self.mu) / self.sigma) ** 2
        )
        lp = jnp.where(x > 0.0, lp, -jnp.inf)
        return lp.sum(-1)

    def supports(self):
        return [positive_support() for _ in range(self.event_dim)]


class Normal(Distribution):
    def __init__(self, loc, scale):
        self.mu = _as_param(loc)
        self.sigma = _as_param(scale)
        self.event_shape = self.mu.shape

    def sample(self, key, sample_shape=()):
        eps = jax.random.normal(key, tuple(sample_shape) + self.mu.shape)
        return self.mu + self.sigma * eps

    def log_prob(self, x):
        lp = (
            -jnp.log(self.sigma)
            - _LOG_SQRT_2PI
            - 0.5 * ((x - self.mu) / self.sigma) ** 2
        )
        return lp.sum(-1)

    def supports(self):
        return [real_support() for _ in range(self.event_dim)]


class Uniform(Distribution):
    def __init__(self, low, high):
        self.lo = _as_param(low)
        self.hi = _as_param(high)
        self.event_shape = self.lo.shape

    def sample(self, key, sample_shape=()):
        u = jax.random.uniform(key, tuple(sample_shape) + self.lo.shape)
        return self.lo + (self.hi - self.lo) * u

    def log_prob(self, x):
        inside = (x >= self.lo) & (x <= self.hi)
        lp = jnp.where(inside, -jnp.log(self.hi - self.lo), -jnp.inf)
        return lp.sum(-1)

    def supports(self):
        return [
            interval_support(float(l), float(h))
            for l, h in zip(self.lo.tolist(), self.hi.tolist())
        ]


class MultipleIndependent(Distribution):
    """Product of heterogeneous 1-D (or small-d) marginals, concatenated along
    the event axis. Mirrors ``sbi.utils.MultipleIndependent`` as used by
    ``build_prior_theta`` (reference rt_choice_model_pipeline.py:38-46)."""

    def __init__(self, dists: Sequence[Distribution]):
        self.dists = list(dists)
        self._dims = [d.event_dim for d in self.dists]
        self.event_shape = (sum(self._dims),)

    def sample(self, key, sample_shape=()):
        keys = jax.random.split(key, len(self.dists))
        parts = [d.sample(k, sample_shape) for d, k in zip(self.dists, keys)]
        return jnp.concatenate(parts, axis=-1)

    def log_prob(self, x):
        out = 0.0
        i = 0
        for d, w in zip(self.dists, self._dims):
            out = out + d.log_prob(x[..., i : i + w])
            i += w
        return out

    def supports(self):
        out: list[Support] = []
        for d in self.dists:
            out.extend(d.supports())
        return out


def BoxUniform(low, high) -> Uniform:
    """sbi-style BoxUniform (used by the reference notebooks)."""
    return Uniform(low, high)


# ---------------------------------------------------------------------------
# Bijectors (constrained <-> unconstrained), replacing sbi.utils.mcmc_transform
# ---------------------------------------------------------------------------
class Bijector:
    """Elementwise bijection stack derived from per-dimension supports.

    ``forward`` maps unconstrained u -> constrained theta (the direction MCMC
    integrates in u-space and evaluates the model in theta-space);
    ``inverse`` maps theta -> u; ``forward_log_det`` is
    ``sum_d log |d theta_d / d u_d|`` evaluated at u.
    """

    def __init__(self, supports: Sequence[Support]):
        self._kinds = [s.kind for s in supports]
        self._lo = jnp.asarray(
            [s.lo if s.lo is not None else 0.0 for s in supports], jnp.float32
        )
        self._hi = jnp.asarray(
            [s.hi if s.hi is not None else 1.0 for s in supports], jnp.float32
        )
        # Encode kinds as ints for vectorized select: 0=real, 1=positive, 2=interval.
        self._code = jnp.asarray(
            [
                {"real": 0, "positive": 1, "interval": 2}[s.kind]
                for s in supports
            ],
            jnp.int32,
        )
        self.dim = len(self._kinds)

    def forward(self, u):
        width = self._hi - self._lo
        interval = self._lo + width * jax.nn.sigmoid(u)
        positive = jnp.exp(u)
        return jnp.where(
            self._code == 0, u, jnp.where(self._code == 1, positive, interval)
        )

    def inverse(self, theta):
        width = self._hi - self._lo
        frac = jnp.clip((theta - self._lo) / width, 1e-7, 1.0 - 1e-7)
        interval = jnp.log(frac) - jnp.log1p(-frac)
        positive = jnp.log(jnp.clip(theta, 1e-37, None))
        return jnp.where(
            self._code == 0,
            theta,
            jnp.where(self._code == 1, positive, interval),
        )

    def forward_log_det(self, u):
        width = self._hi - self._lo
        # d/du [lo + width*sigmoid(u)] = width * sigmoid(u) * (1 - sigmoid(u))
        interval = (
            jnp.log(width) + jax.nn.log_sigmoid(u) + jax.nn.log_sigmoid(-u)
        )
        positive = u
        per_dim = jnp.where(
            self._code == 0,
            jnp.zeros_like(u),
            jnp.where(self._code == 1, positive, interval),
        )
        return per_dim.sum(-1)


def mcmc_transform(prior: Distribution) -> Bijector:
    """Build the constrained->unconstrained bijection from prior supports.

    Replaces ``sbi.utils.mcmc_transform`` at the reference call site
    (reference mnle.py:75): Beta-supported dims get a scaled sigmoid,
    LogNormal-supported dims get exp, unconstrained dims identity.
    """
    return Bijector(prior.supports())
