"""Pallas-fused MNLE log-prob: trunk -> heads -> RQ-spline chain in one kernel.

The MNLE forward is the inner loop of every NUTS gradient step — the
reference evaluates it through a stack of framework layers
(reference: src/sbi_for_diffusion_models/potentials.py:98-117 calls
``estimator.log_prob`` once per (trials x thetas) tile; the estimator itself
is pyknos/nflows torch modules, reference mnle.py:31-39). Here the whole
per-row computation — categorical head, flow trunk, all ``num_transforms``
spline-parameter heads, and the sequential rational-quadratic spline chain —
is ONE Pallas kernel: weights and activations stay in VMEM, nothing round-
trips to HBM between layers, and the 10 head projections run as a single
(hidden x 10*(3K-1)) MXU matmul.

Differentiation: ``pallas_call`` has no autodiff rule, so the op carries a
``jax.custom_vjp`` whose backward is a second Pallas kernel that recomputes
the forward *inside* the kernel under ``jax.vjp`` and emits gradients w.r.t.
the continuous input and the context. That covers the NUTS potential (theta
gradients flow through the context; the data and network weights are
constants there). Parameter gradients are NOT provided — training keeps the
plain-XLA ``MNLE.log_prob_fn`` path.

Parity: the kernel shares the spline math with ``nets/spline.py``
(``use_gather=False`` masked-knot-lookup variant) and the layer structure of
``nets/mnle_net.MNLENet``; ``tests/test_mnle_pallas.py`` checks value and
gradient parity against the XLA path in interpret mode on CPU and compiled
on TPU.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..nets.spline import num_spline_params, rq_spline_forward

__all__ = ["make_fused_logprob", "pack_mnle_weights"]

_LOG_SQRT_2PI = 0.5 * np.log(2.0 * np.pi)


def _dense(h, W, b):
    # HIGHEST precision: the layers are tiny (<1 MFLOP per row-block), so the
    # extra MXU passes are free, and NUTS trajectories are shaped by these
    # gradients — keep them at true f32 accuracy rather than bf16-pass noise.
    return jnp.dot(
        h, W, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ) + b


def pack_mnle_weights(estimator) -> list[jnp.ndarray]:
    """Flatten the estimator's flax param tree into the kernel's positional
    weight list: cat layers, trunk layers, then the concatenated spline
    heads (one (hidden, T*(3K-1)) matrix + bias)."""
    p = estimator.params
    cfg = estimator.cfg
    n_layers = cfg.trunk_depth + 1  # _MLP: depth hidden Dense + 1 output Dense

    ws: list[jnp.ndarray] = []
    # Biases are kept 2-D (1, n): Mosaic tiles 2-D buffers natively and the
    # (B, n) + (1, n) broadcast is free on the VPU.
    for i in range(n_layers):
        d = p["cat_net"][f"Dense_{i}"]
        ws += [jnp.asarray(d["kernel"]), jnp.asarray(d["bias"]).reshape(1, -1)]
    for i in range(n_layers):
        d = p["flow_trunk"][f"Dense_{i}"]
        ws += [jnp.asarray(d["kernel"]), jnp.asarray(d["bias"]).reshape(1, -1)]
    head_W = jnp.concatenate(
        [jnp.asarray(p[f"spline_head_{i}"]["kernel"]) for i in range(cfg.num_transforms)],
        axis=1,
    )
    head_b = jnp.concatenate(
        [jnp.asarray(p[f"spline_head_{i}"]["bias"]) for i in range(cfg.num_transforms)]
    )
    ws += [head_W, head_b.reshape(1, -1)]
    return ws


def _rows_logp(t, oh, ctx, weights, *, n_layers, num_transforms, num_bins,
               tail_bound, censored_col=None):
    """Pure per-row MNLE log p(t, choice | ctx) on standardized inputs.

    t: (B,), oh: (B, C), ctx: (B, D). Shared by the forward kernel, the
    recompute-VJP backward kernel, and (with the XLA spline) parity tests.
    """
    cat = weights[: 2 * n_layers]
    trunk = weights[2 * n_layers : 4 * n_layers]
    head_W, head_b = weights[4 * n_layers], weights[4 * n_layers + 1]

    h = ctx
    for i in range(n_layers - 1):
        h = jax.nn.relu(_dense(h, cat[2 * i], cat[2 * i + 1]))
    logits = jax.nn.log_softmax(
        _dense(h, cat[2 * (n_layers - 1)], cat[2 * n_layers - 1]), axis=-1
    )
    cat_lp = jnp.sum(logits * oh, axis=-1)

    f = jnp.concatenate([ctx, oh], axis=-1)
    for i in range(n_layers - 1):
        f = jax.nn.relu(_dense(f, trunk[2 * i], trunk[2 * i + 1]))
    emb = jax.nn.relu(_dense(f, trunk[2 * (n_layers - 1)], trunk[2 * n_layers - 1]))
    sp = _dense(emb, head_W, head_b)  # (B, T * (3K-1))

    S = num_spline_params(num_bins)
    z = t
    log_det = jnp.zeros_like(t)
    for i in range(num_transforms):
        z, ld = rq_spline_forward(
            z,
            sp[:, i * S : (i + 1) * S],
            num_bins=num_bins,
            tail_bound=tail_bound,
            use_gather=False,
        )
        log_det = log_det + ld
    base = -_LOG_SQRT_2PI - 0.5 * z * z
    if censored_col is not None:
        # Censored-RT likelihood (MNLEConfig.censor_rt): censored rows keep
        # only the categorical term; mask derived from the one-hot column.
        return cat_lp + (1.0 - oh[:, censored_col]) * (log_det + base)
    return cat_lp + log_det + base


def make_fused_logprob(
    estimator,
    *,
    block_rows: int = 256,
    block_rows_bwd: int = 64,
    interpret: bool = False,
):
    """Build ``fn(x, condition) -> log p(x | condition)`` backed by the fused
    kernel, semantically identical to ``estimator.log_prob_fn`` (same input
    transforms, z-scoring, and change-of-variables corrections — those run
    in XLA around the kernel, where they fuse into neighbors for free).

    The estimator's weights are closed over as constants: the returned
    function differentiates w.r.t. its *inputs* (the NUTS use case), not the
    parameters.
    """
    cfg = estimator.cfg
    n_layers = cfg.trunk_depth + 1
    weights = pack_mnle_weights(estimator)
    # Fixed, modest block sizes: Mosaic's compile time AND its scoped-VMEM
    # stack both scale with rows-per-block through the unrolled
    # 10-transform spline graph (the recompute-VJP backward holds every
    # transform's residuals at once — 24 MB at 128 rows, vs the 16 MB
    # default limit). Small blocks + a grid keep compiles fast and memory
    # bounded; the grid pipelines, so throughput is unaffected.
    _compiler_params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    rows_kwargs = dict(
        n_layers=n_layers,
        num_transforms=cfg.num_transforms,
        num_bins=cfg.num_bins,
        tail_bound=cfg.tail_bound,
        censored_col=cfg.censored_category if cfg.censor_rt else None,
    )
    C = cfg.num_categories

    def _fwd_kernel(t_ref, oh_ref, ctx_ref, *w_refs):
        out_ref = w_refs[-1]
        ws = [r[:] for r in w_refs[:-1]]
        out_ref[:, 0] = _rows_logp(
            t_ref[:, 0], oh_ref[:], ctx_ref[:], ws, **rows_kwargs
        )

    def _bwd_kernel(t_ref, oh_ref, ctx_ref, g_ref, *w_refs):
        dt_ref, dctx_ref = w_refs[-2], w_refs[-1]
        ws = [r[:] for r in w_refs[:-2]]
        oh = oh_ref[:]

        def f(t_blk, ctx_blk):
            return _rows_logp(t_blk, oh, ctx_blk, ws, **rows_kwargs)

        _, vjp = jax.vjp(f, t_ref[:, 0], ctx_ref[:])
        dt, dctx = vjp(g_ref[:, 0])
        dt_ref[:, 0] = dt
        dctx_ref[:] = dctx

    def _round8(n):
        return ((n + 7) // 8) * 8  # f32 sublane multiple

    # Explicit vmap rules (NUTS vmaps value_and_grad over chains): flatten the
    # batch axis into the row axis and re-enter the unbatched op. This keeps
    # Mosaic's automatic pallas_call batching — which miscompiles the
    # multi-output backward kernel (wrong dctx under a batched grid) — out of
    # the picture entirely, and is faster anyway: C chains x T trials become
    # one large row-blocked kernel instead of C tiny padded grid programs.
    def _flatten_batch(axis_size, in_batched, args):
        out = []
        for a, b in zip(args, in_batched):
            a = a if b else jnp.broadcast_to(a, (axis_size,) + a.shape)
            out.append(a.reshape((axis_size * a.shape[1],) + a.shape[2:]))
        return out

    @jax.custom_batching.custom_vmap
    def _pallas_fwd(t2, oh, ctx):
        N, D = t2.shape[0], ctx.shape[1]
        B = min(block_rows, _round8(N))
        n_blocks = pl.cdiv(N, B)
        N_pad = n_blocks * B
        pad = N_pad - N
        if pad:
            t2 = jnp.pad(t2, ((0, pad), (0, 0)))
            oh = jnp.pad(oh, ((0, pad), (0, 0)))
            ctx = jnp.pad(ctx, ((0, pad), (0, 0)))
        data_specs = [
            pl.BlockSpec((B, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ]
        w_specs = [
            pl.BlockSpec(
                w.shape, lambda i, nd=w.ndim: (0,) * nd, memory_space=pltpu.VMEM
            )
            for w in weights
        ]
        out = pl.pallas_call(
            _fwd_kernel,
            grid=(n_blocks,),
            in_specs=data_specs + w_specs,
            out_specs=pl.BlockSpec(
                (B, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((N_pad, 1), jnp.float32),
            compiler_params=None if interpret else _compiler_params,
            interpret=interpret,
        )(t2, oh, ctx, *weights)
        return out[:N, 0]

    @_pallas_fwd.def_vmap
    def _pallas_fwd_vmap(axis_size, in_batched, t2, oh, ctx):
        n = (t2 if in_batched[0] else oh if in_batched[1] else ctx).shape[1]
        t2, oh, ctx = _flatten_batch(axis_size, in_batched, (t2, oh, ctx))
        return _pallas_fwd(t2, oh, ctx).reshape(axis_size, n), True

    @jax.custom_batching.custom_vmap
    def _pallas_bwd(t2, oh, ctx, g2):
        N, D = t2.shape[0], ctx.shape[1]
        B = min(block_rows_bwd, _round8(N))
        n_blocks = pl.cdiv(N, B)
        N_pad = n_blocks * B
        pad = N_pad - N
        if pad:
            t2 = jnp.pad(t2, ((0, pad), (0, 0)))
            oh = jnp.pad(oh, ((0, pad), (0, 0)))
            ctx = jnp.pad(ctx, ((0, pad), (0, 0)))
            g2 = jnp.pad(g2, ((0, pad), (0, 0)))
        data_specs = [
            pl.BlockSpec((B, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ]
        w_specs = [
            pl.BlockSpec(
                w.shape, lambda i, nd=w.ndim: (0,) * nd, memory_space=pltpu.VMEM
            )
            for w in weights
        ]
        dt, dctx = pl.pallas_call(
            _bwd_kernel,
            grid=(n_blocks,),
            in_specs=data_specs + w_specs,
            out_specs=[
                pl.BlockSpec((B, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((B, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((N_pad, 1), jnp.float32),
                jax.ShapeDtypeStruct((N_pad, D), jnp.float32),
            ],
            compiler_params=None if interpret else _compiler_params,
            interpret=interpret,
        )(t2, oh, ctx, g2, *weights)
        return dt[:N, 0], dctx[:N]

    @_pallas_bwd.def_vmap
    def _pallas_bwd_vmap(axis_size, in_batched, t2, oh, ctx, g2):
        args = (t2, oh, ctx, g2)
        n = args[list(in_batched).index(True)].shape[1]
        t2, oh, ctx, g2 = _flatten_batch(axis_size, in_batched, args)
        dt, dctx = _pallas_bwd(t2, oh, ctx, g2)
        return (
            dt.reshape(axis_size, n),
            dctx.reshape(axis_size, n, dctx.shape[-1]),
        ), (True, True)

    @jax.custom_vjp
    def fused_rows(t, oh, ctx):
        return _pallas_fwd(t[:, None], oh, ctx)

    def fused_fwd(t, oh, ctx):
        return fused_rows(t, oh, ctx), (t, oh, ctx)

    def fused_bwd(res, g):
        t, oh, ctx = res
        dt, dctx = _pallas_bwd(t[:, None], oh, ctx, g[:, None])
        return dt, jnp.zeros_like(oh), dctx

    fused_rows.defvjp(fused_fwd, fused_bwd)

    # ---- outer transforms (identical math to MNLE.log_prob_fn) ------------
    est = estimator
    from ..nets.mnle_net import MNLENet

    def log_prob(x, condition):
        x = jnp.asarray(x, jnp.float32)
        condition = jnp.asarray(condition, jnp.float32)
        batch_shape = jnp.broadcast_shapes(x.shape[:-1], condition.shape[:-1])
        x = jnp.broadcast_to(x, batch_shape + x.shape[-1:])
        condition = jnp.broadcast_to(condition, batch_shape + condition.shape[-1:])

        rt = x[..., 0]
        choice = x[..., 1].astype(jnp.int32)
        c = condition
        if cfg.z_score_theta:
            c = (c - est.cond_mean) / est.cond_std
        log_det = jnp.zeros_like(rt)
        t = rt
        if cfg.log_transform_x:
            t_safe = jnp.maximum(t, 1e-37)
            log_det = log_det - jnp.log(t_safe)
            t = jnp.log(t_safe)
        if cfg.z_score_x:
            t = (t - est.x_mean) / est.x_std
            log_det = log_det - jnp.log(est.x_std)
        if cfg.censor_rt:
            # Censored rows carry no RT terms at all (kernel masks the
            # in-kernel spline log-det + base; the outer change-of-variables
            # correction is masked here).
            log_det = jnp.where(choice == cfg.censored_category, 0.0, log_det)
        onehot = jax.nn.one_hot(choice, cfg.num_categories)
        ctx = est._net.apply(
            {"params": est.params}, c, condition, method=MNLENet.make_context
        )

        n = int(np.prod(batch_shape)) if batch_shape else 1
        lp = fused_rows(
            t.reshape(n),
            onehot.reshape(n, cfg.num_categories),
            ctx.reshape(n, ctx.shape[-1]),
        )
        return lp.reshape(batch_shape) + log_det

    return log_prob
