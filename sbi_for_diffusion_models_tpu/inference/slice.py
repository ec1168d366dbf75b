"""Axis-aligned slice sampler, vectorized over chains (pure JAX).

Owns the capability of sbi's ``slice_np_vectorized`` MCMC method, the fallback
recipe the reference notebooks rely on when NUTS misbehaves (reference:
src/notebooks/ryans_test.ipynb cells 3-4, ``method="slice_np_vectorized"``,
20 chains, thin 5).

Classic Neal (2003) stepping-out + shrinkage per coordinate, with bounded
loops so the whole sampler compiles to one XLA program: ``vmap`` over chains,
``lax.scan`` over draws, ``fori_loop`` over coordinates, ``while_loop`` for
stepping-out/shrinkage.

Per-coordinate interval widths adapt during warmup (sbi's vectorized slice
tunes widths the same way): each accepted move updates an exponential moving
average of |z - x0| per dimension and the bracket width is 4x that average,
so stepping-out cost stays bounded whether the posterior is much narrower or
much wider than the initial guess.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["run_slice"]

# Width adaptation: EMA decay and bracket = _WIDTH_MULT * E|z - x0|.
# For a Gaussian slice, E|z - x0| ~ 0.9 sigma, so 4x gives a ~3.5 sigma
# initial bracket -- rarely needs stepping out, rarely over-shrinks.
_WIDTH_EMA = 0.9
_WIDTH_MULT = 4.0


def _slice_one_dim(key, x, d, logp_fn, width, max_steps_out, max_shrink):
    """Slice-update coordinate d of x. Returns (new x, accepted, |move|)."""
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
    x_new = x.at[d].set(jnp.where(accepted, z, x0))
    return x_new, accepted, jnp.abs(z - x0)


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
    adapt_width: bool = True,
    mode_hop=None,
) -> Tuple[jnp.ndarray, dict]:
    """Run the vectorized slice sampler.

    init_u: (num_chains, D) in *unconstrained* space. ``data``: optional
    pytree with leading axis num_chains giving each chain its own
    conditioning data (``logp_fn(u, data_i)``) — same contract as
    ``run_nuts``, so batched SBC works with either sampler.

    Returns (samples (num_chains, num_samples, D), info dict) where info has
    ``accept_prob`` (fraction of coordinate updates whose shrinkage found an
    in-slice point, (num_chains, num_samples)) and ``width`` (final adapted
    per-coordinate widths, (num_chains, D)).

    ``mode_hop``: optional Metropolis move ``hop(key, u, logp, g, vg_fn) ->
    (u, logp, g)`` applied after every sweep (see run_nuts).
    """
    num_chains, D = init_u.shape

    def chain(chain_key, x0, data_i):
        if data is None:
            lp_fn = logp_fn
        else:
            lp_fn = lambda u: logp_fn(u, data_i)

        def sweep(key, x, w, adapt):
            """One full coordinate sweep; adapts w when ``adapt``."""

            def body(d, carry):
                x, w, n_acc, key = carry
                k = jax.random.fold_in(key, d)
                x, accepted, move = _slice_one_dim(
                    k, x, d, lp_fn, w[d], max_steps_out, max_shrink
                )
                w_new = _WIDTH_EMA * w[d] + (1 - _WIDTH_EMA) * _WIDTH_MULT * move
                w_new = jnp.clip(w_new, 1e-3, 1e3)
                w = w.at[d].set(jnp.where(adapt & accepted, w_new, w[d]))
                return x, w, n_acc + accepted.astype(jnp.float32), key

            x, w, n_acc, _ = lax.fori_loop(
                0, D, body, (x, w, jnp.float32(0.0), key)
            )
            return x, w, n_acc / D

        def _hop_apply(key, x):
            if mode_hop is None:
                return x
            vg = jax.value_and_grad(lp_fn)
            logp0, g0 = vg(x)
            x, _, _ = mode_hop(jax.random.fold_in(key, 0x9E37), x, logp0, g0, vg)
            return x

        def warm_step(carry, k):
            x, w = carry
            x, w, _ = sweep(k, x, w, jnp.bool_(adapt_width))
            x = _hop_apply(k, x)
            return (x, w), None

        def samp_step(carry, k):
            x, w = carry

            def inner(carry, kk):
                x, w = carry
                x, w, acc = sweep(kk, x, w, jnp.bool_(False))
                x = _hop_apply(kk, x)
                return (x, w), acc

            (x, w), accs = lax.scan(inner, (x, w), jax.random.split(k, thin))
            return (x, w), (x, jnp.mean(accs))

        w0 = jnp.full((D,), jnp.float32(width))
        k_warm, k_samp = jax.random.split(chain_key)
        (x, w), _ = lax.scan(
            warm_step, (x0, w0), jax.random.split(k_warm, max(num_warmup, 1))
        )
        (_, w), (samples, accs) = lax.scan(
            samp_step, (x, w), jax.random.split(k_samp, num_samples)
        )
        return samples, accs, w

    keys = jax.random.split(key, num_chains)
    samples, accs, widths = jax.vmap(
        chain, in_axes=(0, 0, None if data is None else 0)
    )(keys, init_u, data)
    return samples, {"accept_prob": accs, "width": widths}
