"""MCMCPosterior: the user-facing sampler wrapper.

API parity with sbi's ``MCMCPosterior`` as the reference uses it
(reference: src/sbi_for_diffusion_models/mnle.py:77-93): construct with a
potential, a proposal (for initialization, ``init_strategy="proposal"``), and
a theta transform; call ``.sample((S,), x=x_o)`` to get S posterior draws.

TPU-native design: the potential is a pure function, so the whole MCMC run —
warmup adaptation and sampling for all chains — is one compiled program.
Chains are vmapped; the per-chain draw budget is ceil(S / num_chains) and
chains are interleaved into the flat (S, D) output, matching the reference's
chain-pooled return (reference mnle.py:89-95).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..distributions import Bijector, Distribution
from ..utils.rng import as_key
from .nuts import run_nuts
from .slice import run_slice

__all__ = ["MCMCPosterior"]


class MCMCPosterior:
    def __init__(
        self,
        potential_fn,
        proposal: Distribution,
        theta_transform: Bijector,
        *,
        method: str = "nuts",
        num_chains: int = 2,
        warmup_steps: int = 100,
        thin: int = 1,
        max_tree_depth: int = 10,
        target_accept: float = 0.8,
        init_strategy: str = "proposal",
        num_workers: int = 1,
        verbose: bool = True,
        auto_fallback: bool = True,
        fallback_divergence_rate: float = 0.10,
        fallback_r_hat: float = 1.5,
        mode_hop=None,
    ):
        if method not in ("nuts", "nuts_pyro", "hmc", "slice", "slice_np_vectorized"):
            raise ValueError(f"unknown MCMC method {method!r}")
        if init_strategy not in ("proposal", "resample"):
            # sbi also offers "sir"/"latest_sample"; anything we don't
            # implement is rejected instead of silently running "proposal".
            raise ValueError(
                f"unknown init_strategy {init_strategy!r}: "
                "expected 'proposal' or 'resample'"
            )
        self.potential = potential_fn
        self.proposal = proposal
        self.bij = theta_transform
        self.method = {"nuts_pyro": "nuts", "slice_np_vectorized": "slice"}.get(
            method, method
        )
        self.num_chains = int(num_chains)
        self.warmup_steps = int(warmup_steps)
        self.thin = int(thin)
        self.max_tree_depth = int(max_tree_depth)
        self.target_accept = float(target_accept)
        self.init_strategy = init_strategy
        self.verbose = verbose
        # NUTS -> slice auto-fallback (the reference notebooks' operational
        # recipe, ryans_test.ipynb cell 4: try nuts_pyro, fall back to
        # slice_np_vectorized): trigger on divergence storms or failed
        # mixing (split R-hat), both signs of adaptation failure on stiff
        # learned-likelihood geometry.
        self.mode_hop = mode_hop
        self.auto_fallback = bool(auto_fallback)
        self.fallback_divergence_rate = float(fallback_divergence_rate)
        self.fallback_r_hat = float(fallback_r_hat)
        self.used_fallback = False
        self._last_info: Optional[dict] = None

    # -- potential in unconstrained space ----------------------------------
    def _logp_u(self, u):
        theta = self.bij.forward(u)
        return self.potential.potential_fn(theta) + self.bij.forward_log_det(u)

    def _init_positions(self, key) -> jnp.ndarray:
        """Chain starts. "proposal": draw from the proposal (reference
        mnle.py:85). "resample": draw a pool from the proposal, weight by the
        potential, and resample the starts (sbi's importance-resampling
        init) — chains start in the posterior's bulk, shortening warmup."""
        if self.init_strategy == "proposal":
            theta0 = self.proposal.sample(key, (self.num_chains,))
            return self.bij.inverse(jnp.asarray(theta0, jnp.float32))
        k_pool, k_pick = jax.random.split(key)
        pool_size = max(32 * self.num_chains, 256)
        pool = jnp.asarray(
            self.proposal.sample(k_pool, (pool_size,)), jnp.float32
        )
        logw = jax.jit(jax.vmap(self.potential.potential_fn))(pool)
        logw = jnp.where(jnp.isfinite(logw), logw, -jnp.inf)
        idx = jax.random.categorical(k_pick, logw, shape=(self.num_chains,))
        return self.bij.inverse(pool[idx])

    def _nuts_failed(self, samples_u, info) -> bool:
        """Health check behind the NUTS -> slice auto-fallback."""
        if not bool(jnp.all(jnp.isfinite(samples_u))):
            return True
        div_rate = float(jnp.mean(info["diverging"].astype(jnp.float32)))
        if div_rate > self.fallback_divergence_rate:
            return True
        if self.num_chains >= 2 and samples_u.shape[1] >= 10:
            from .diagnostics import split_r_hat

            if float(np.max(split_r_hat(np.asarray(samples_u)))) > self.fallback_r_hat:
                return True
        return False

    def sample(
        self,
        sample_shape: Tuple[int, ...],
        x=None,
        *,
        key=None,
        seed: int | None = 0,
        show_progress_bars: bool = False,
    ) -> jnp.ndarray:
        """Draw ``sample_shape[0]`` pooled posterior samples (S, D)."""
        if x is not None and hasattr(self.potential, "set_x_o"):
            self.potential.set_x_o(x)
        num_samples = int(sample_shape[0])
        key = as_key(key if key is not None else seed)
        k_init, k_run = jax.random.split(key)

        init_u = self._init_positions(k_init)
        per_chain = math.ceil(num_samples / self.num_chains)

        if self.method in ("nuts", "hmc"):
            samples_u, info = run_nuts(
                k_run,
                self._logp_u,
                init_u,
                num_warmup=self.warmup_steps,
                num_samples=per_chain,
                max_depth=self.max_tree_depth,
                target_accept=self.target_accept,
                thin=self.thin,
            )
            if self.auto_fallback and self._nuts_failed(samples_u, info):
                self.used_fallback = True
                print(
                    "[mcmc] NUTS unhealthy (divergence storm / failed "
                    "mixing); falling back to the vectorized slice sampler "
                    "(reference recipe, ryans_test.ipynb cell 4)"
                )
                samples_u, info = run_slice(
                    jax.random.fold_in(k_run, 1),
                    self._logp_u,
                    init_u,
                    num_warmup=self.warmup_steps,
                    num_samples=per_chain,
                    thin=self.thin,
                    mode_hop=self.mode_hop,
                )
        else:
            samples_u, info = run_slice(
                k_run,
                self._logp_u,
                init_u,
                num_warmup=self.warmup_steps,
                num_samples=per_chain,
                thin=self.thin,
                mode_hop=self.mode_hop,
            )
        self._last_info = info

        # (C, S_per, D) -> interleave chains -> (C * S_per, D) -> trim to S.
        theta = self.bij.forward(samples_u)
        pooled = jnp.swapaxes(theta, 0, 1).reshape(-1, theta.shape[-1])
        out = pooled[:num_samples]
        if self.verbose and self.method == "nuts" and "diverging" in info:
            ap = float(jnp.mean(info["accept_prob"]))
            dv = int(jnp.sum(info["diverging"]))
            print(
                f"[mcmc] nuts: chains={self.num_chains} draws/chain={per_chain} "
                f"mean_accept={ap:.3f} divergences={dv}"
            )
        if self.verbose and self.num_chains >= 2 and per_chain >= 10:
            from .diagnostics import summarize_chains

            self._last_diagnostics = summarize_chains(
                np.asarray(theta), verbose=True
            )
        return out

    @property
    def last_info(self) -> Optional[dict]:
        return self._last_info


def make_grid_hop(bij, index: int, delta: float, multiples=(-2, -1, 1, 2)):
    """Metropolis mode-hop for KNOWN periodic posterior structure.

    The pulse-DDM posterior is near-periodically multimodal in t_nd: shifting
    t_nd by one pulse interval Delta while re-attributing every trial's hit
    to the adjacent pulse leaves the likelihood almost unchanged (the RT
    grid rt = t_nd + k*Delta aliases), so trajectory-based samplers get
    stuck in one t_nd mode (observed: split-R-hat up to ~300 with ZERO
    divergences). This move proposes theta' = theta with theta[index]
    shifted by m*Delta (m drawn uniformly from symmetric ``multiples``) and
    accepts with the exact posterior ratio — a valid MH kernel in theta
    space (the proposal is symmetric there, so bijector terms cancel except
    through the evaluated densities; see run_nuts ``mode_hop``).

    Returns ``hop(key, u, logp, g, vg_fn) -> (u, logp, g)`` operating on the
    UNCONSTRAINED state used by run_nuts/run_slice: logp/g are u-space
    values including the bijector log-det, so the theta-space ratio is
    recovered by subtracting ``bij.forward_log_det`` on both sides.
    Out-of-support proposals are rejected exactly (target density zero).
    """
    delta = float(delta)
    mults = jnp.asarray(multiples, jnp.float32)

    def hop(key, u, logp, g, vg_fn):
        k_m, k_a = jax.random.split(key)
        m = mults[jax.random.randint(k_m, (), 0, mults.shape[0])]
        theta = bij.forward(u)
        theta_new = theta.at[index].add(m * delta)
        # Support guard: Beta-supported t_nd lives in (0, 1).
        valid = (theta_new[index] > 1e-6) & (theta_new[index] < 1.0 - 1e-6)
        theta_safe = jnp.where(valid, theta_new, theta)
        u_prop = bij.inverse(theta_safe)
        logp_prop, g_prop = vg_fn(u_prop)
        log_ratio = (logp_prop - bij.forward_log_det(u_prop)) - (
            logp - bij.forward_log_det(u)
        )
        accept = valid & (
            jnp.log(jax.random.uniform(k_a)) < jnp.minimum(log_ratio, 0.0)
        )
        pick = lambda a, b: jnp.where(accept, a, b)
        return pick(u_prop, u), pick(logp_prop, logp), jax.tree.map(pick, g_prop, g)

    return hop
