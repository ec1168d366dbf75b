"""SNPE / SNLE: amortized posterior and likelihood estimation.

Owns the alternate inference workflows the reference explored in
``ryans_test.ipynb`` (reference: src/notebooks/ryans_test.ipynb cells 0-2:
``SNPE(prior).append_simulations(theta, x).train()`` and the analogous SNLE
recipe on the choice-only simulator with a BoxUniform prior):

* ``train_snpe`` — neural posterior estimation: fit q(theta | x) directly
  with a conditional coupling NSF; returns a ``DirectPosterior`` whose
  ``sample`` draws amortized posterior samples for any observation, with
  prior-support rejection (sbi's leakage correction).
* ``train_snle`` — neural likelihood estimation: fit q(x | theta); posterior
  sampling then goes through the standard MCMC machinery
  (``MCMCPosterior``), exactly like the MNLE path but with a continuous-only
  density estimator.

Both are single-round (proposal == prior), which is the regime the notebooks
use; the returned estimators are pure-JAX and jit/vmap-safe.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .distributions import Distribution, mcmc_transform
from .inference.mcmc import MCMCPosterior
from .nets.flows import FlowEstimator, NSFConfig, build_flow, fit_flow
from .run_config import RunConfig
from .utils.rng import as_key

__all__ = ["train_snpe", "train_snle", "DirectPosterior", "SNLEPotential"]


def _stats(a, axis=0):
    return jnp.mean(a, axis=axis), jnp.maximum(jnp.std(a, axis=axis), 1e-6)


@dataclass
class DirectPosterior:
    """Amortized q(theta | x) with prior-support rejection sampling."""

    flow: FlowEstimator
    prior: Distribution

    def log_prob(self, theta, x):
        return self.flow.log_prob(jnp.asarray(theta), jnp.asarray(x))

    def sample(self, sample_shape, x, *, key=None, seed: int = 0, max_tries: int = 20):
        """Draw ``sample_shape[0]`` samples given one observation row x.

        Rejects draws outside the prior support and re-draws (bounded), then
        falls back to clipping-free acceptance of whatever remains — matching
        sbi's leakage-corrected DirectPosterior behavior in spirit.
        """
        n = int(sample_shape[0])
        key = as_key(key if key is not None else seed)
        x = jnp.asarray(x, jnp.float32).reshape(1, -1)
        ctx = jnp.broadcast_to(x, (n, x.shape[1]))

        samples = self.flow.sample(jax.random.fold_in(key, 0), ctx)
        ok = jnp.isfinite(self.prior.log_prob(samples))
        for i in range(1, max_tries):
            if bool(ok.all()):
                break
            fresh = self.flow.sample(jax.random.fold_in(key, i), ctx)
            fresh_ok = jnp.isfinite(self.prior.log_prob(fresh))
            take = (~ok) & fresh_ok
            samples = jnp.where(take[:, None], fresh, samples)
            ok = ok | fresh_ok
        return samples


def train_snpe(
    cfg: RunConfig,
    prior: Distribution,
    theta,
    x,
    *,
    hidden_features: int = 64,
    num_transforms: int = 5,
    num_bins: int = 16,
    seed=0,
    verbose: bool = False,
) -> DirectPosterior:
    """Single-round SNPE (NPE): max-likelihood fit of q(theta | x)
    (reference ryans_test.ipynb cell 1)."""
    theta = jnp.asarray(theta, jnp.float32)
    x = jnp.asarray(x, jnp.float32)
    t_mean, t_std = _stats(theta)
    x_mean, x_std = _stats(x)
    flow_cfg = NSFConfig(
        dim=int(theta.shape[1]),
        context_dim=int(x.shape[1]),
        hidden_features=hidden_features,
        num_transforms=num_transforms,
        num_bins=num_bins,
    )
    flow = build_flow(
        as_key(seed), flow_cfg,
        y_mean=t_mean, y_std=t_std, c_mean=x_mean, c_std=x_std,
    )
    flow = fit_flow(
        flow, theta, x,
        batch_size=min(cfg.TRAIN_BATCH_SIZE, theta.shape[0]),
        max_epochs=cfg.TRAIN_MAX_EPOCHS,
        patience=cfg.TRAIN_STOP_AFTER_EPOCHS,
        learning_rate=cfg.TRAIN_LEARNING_RATE,
        seed=seed,
        verbose=verbose,
    )
    return DirectPosterior(flow=flow, prior=prior)


class SNLEPotential:
    """theta-potential for an SNLE likelihood over IID observations."""

    def __init__(self, prior: Distribution, flow: FlowEstimator, x_o=None):
        self.prior = prior
        self.flow = flow
        self.x_o = jnp.asarray(x_o, jnp.float32) if x_o is not None else None

    def set_x_o(self, x_o):
        self.x_o = jnp.asarray(x_o, jnp.float32)

    def potential_fn(self, theta, x=None):
        x = self.x_o if x is None else jnp.asarray(x, jnp.float32)
        lp = self.prior.log_prob(theta)
        ll = jnp.sum(
            jax.vmap(lambda xi: self.flow.log_prob_fn(self.flow.params, xi, theta))(x)
        )
        return lp + ll


def train_snle(
    cfg: RunConfig,
    prior: Distribution,
    theta,
    x,
    *,
    hidden_features: int = 64,
    num_transforms: int = 5,
    num_bins: int = 16,
    seed=0,
    verbose: bool = False,
):
    """Single-round SNLE: fit q(x | theta); wrap into MCMC for the posterior
    (reference ryans_test.ipynb cells 2-4). Returns (flow, make_posterior)
    where ``make_posterior(x_o)`` builds a ready MCMCPosterior."""
    theta = jnp.asarray(theta, jnp.float32)
    x = jnp.asarray(x, jnp.float32)
    x_mean, x_std = _stats(x)
    t_mean, t_std = _stats(theta)
    flow_cfg = NSFConfig(
        dim=int(x.shape[1]),
        context_dim=int(theta.shape[1]),
        hidden_features=hidden_features,
        num_transforms=num_transforms,
        num_bins=num_bins,
    )
    flow = build_flow(
        as_key(seed), flow_cfg,
        y_mean=x_mean, y_std=x_std, c_mean=t_mean, c_std=t_std,
    )
    flow = fit_flow(
        flow, x, theta,
        batch_size=min(cfg.TRAIN_BATCH_SIZE, x.shape[0]),
        max_epochs=cfg.TRAIN_MAX_EPOCHS,
        patience=cfg.TRAIN_STOP_AFTER_EPOCHS,
        learning_rate=cfg.TRAIN_LEARNING_RATE,
        seed=seed,
        verbose=verbose,
    )

    def make_posterior(x_o, method: Optional[str] = None) -> MCMCPosterior:
        return MCMCPosterior(
            potential_fn=SNLEPotential(prior, flow, x_o=x_o),
            proposal=prior,
            theta_transform=mcmc_transform(prior),
            method=method or cfg.MCMC_METHOD,
            num_chains=cfg.NUM_CHAINS,
            warmup_steps=cfg.WARMUP_STEPS,
            thin=cfg.MCMC_THIN,
            max_tree_depth=cfg.MCMC_MAX_TREE_DEPTH,
            target_accept=cfg.MCMC_TARGET_ACCEPT,
        )

    return flow, make_posterior
