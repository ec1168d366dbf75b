"""Axis-aligned slice sampler, vectorized over chains (pure JAX).

Owns the capability of sbi's ``slice_np_vectorized`` MCMC method, the fallback
recipe the reference notebooks rely on when NUTS misbehaves (reference:
src/notebooks/ryans_test.ipynb cells 3-4, ``method="slice_np_vectorized"``,
20 chains, thin 5).

Classic Neal (2003) stepping-out + shrinkage per coordinate, with bounded
loops so the whole sampler compiles to one XLA program: ``vmap`` over chains,
``lax.scan`` over draws, ``fori_loop`` over coordinates, ``while_loop`` for
stepping-out/shrinkage.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["run_slice"]


def _slice_one_dim(key, x, d, logp_fn, width, max_steps_out, max_shrink):
    """Slice-update coordinate d of x. Returns new x."""
    k_h, k_u, k_shrink = jax.random.split(key, 3)
    logp0 = logp_fn(x)
    logy = logp0 + jnp.log(jax.random.uniform(k_h))

    def logp_at(z):
        return logp_fn(x.at[d].set(z))

    x0 = x[d]
    u = jax.random.uniform(k_u) * width
    L0 = x0 - u
    R0 = L0 + width

    def out_cond_L(state):
        L, it = state
        return (logp_at(L) > logy) & (it < max_steps_out)

    def out_body_L(state):
        L, it = state
        return L - width, it + 1

    L, _ = lax.while_loop(out_cond_L, out_body_L, (L0, jnp.int32(0)))

    def out_cond_R(state):
        R, it = state
        return (logp_at(R) > logy) & (it < max_steps_out)

    def out_body_R(state):
        R, it = state
        return R + width, it + 1

    R, _ = lax.while_loop(out_cond_R, out_body_R, (R0, jnp.int32(0)))

    def shrink_cond(state):
        L, R, z, accepted, it = state
        return (~accepted) & (it < max_shrink)

    def shrink_body(state):
        L, R, z, accepted, it = state
        kk = jax.random.fold_in(k_shrink, it)
        z_new = L + (R - L) * jax.random.uniform(kk)
        ok = logp_at(z_new) > logy
        L_new = jnp.where(ok | (z_new >= x0), L, z_new)
        R_new = jnp.where(ok | (z_new < x0), R, z_new)
        return L_new, R_new, jnp.where(ok, z_new, z), ok, it + 1

    _, _, z, accepted, _ = lax.while_loop(
        shrink_cond, shrink_body, (L, R, x0, jnp.bool_(False), jnp.int32(0))
    )
    return x.at[d].set(jnp.where(accepted, z, x0))


def run_slice(
    key: jax.Array,
    logp_fn: Callable[..., jnp.ndarray],
    init_u: jnp.ndarray,
    *,
    num_warmup: int,
    num_samples: int,
    width: float = 1.0,
    max_steps_out: int = 20,
    max_shrink: int = 100,
    thin: int = 1,
    data=None,
) -> Tuple[jnp.ndarray, dict]:
    """Run the vectorized slice sampler.

    init_u: (num_chains, D) in *unconstrained* space. ``data``: optional
    pytree with leading axis num_chains giving each chain its own
    conditioning data (``logp_fn(u, data_i)``) — same contract as
    ``run_nuts``, so batched SBC works with either sampler.
    Returns (samples (num_chains, num_samples, D), info dict).
    """
    num_chains, D = init_u.shape

    def chain(chain_key, x0, data_i):
        if data is None:
            lp_fn = logp_fn
        else:
            lp_fn = lambda u: logp_fn(u, data_i)

        def sweep(key, x):
            """One full coordinate sweep."""

            def body(d, carry):
                x, key = carry
                k = jax.random.fold_in(key, d)
                return _slice_one_dim(
                    k, x, d, lp_fn, jnp.float32(width), max_steps_out, max_shrink
                ), key

            x, _ = lax.fori_loop(0, D, body, (x, key))
            return x

        def step(x, k):
            def inner(x, kk):
                return sweep(kk, x), None

            x, _ = lax.scan(inner, x, jax.random.split(k, thin))
            return x, x

        k_warm, k_samp = jax.random.split(chain_key)
        x, _ = lax.scan(
            lambda x, k: (sweep(k, x), None),
            x0,
            jax.random.split(k_warm, max(num_warmup, 1)),
        )
        _, samples = lax.scan(step, x, jax.random.split(k_samp, num_samples))
        return samples

    keys = jax.random.split(key, num_chains)
    samples = jax.vmap(chain, in_axes=(0, 0, None if data is None else 0))(
        keys, init_u, data
    )
    return samples, {}
