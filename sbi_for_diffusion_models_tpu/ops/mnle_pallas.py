"""Pallas-fused MNLE log-prob: trunk -> heads -> RQ-spline chain in one kernel.

The MNLE forward is the inner loop of every NUTS gradient step — the
reference evaluates it through a stack of framework layers
(reference: src/sbi_for_diffusion_models/potentials.py:98-117 calls
``estimator.log_prob`` once per (trials x thetas) tile; the estimator itself
is pyknos/nflows torch modules, reference mnle.py:31-39). Here the whole
per-row computation — categorical head, flow trunk, (pulse rep) slot head,
all ``num_transforms`` spline-parameter heads, and the sequential
rational-quadratic spline chain — is ONE Pallas kernel: weights and
activations stay in VMEM, nothing round-trips to HBM between layers, and the
head projections run as a single (hidden x T*(spline params)) MXU matmul.

Supported representations: rt_rep="log" (reference-style flow over z-scored
log RT, linear-tail splines) and rt_rep="pulse" with grid_anchor="absolute"
(slot head + circular phase splines). The tnd-anchored pulse variant stays
on the XLA path.

Differentiation: ``pallas_call`` has no autodiff rule, so the op carries a
``jax.custom_vjp`` whose backward is a second Pallas kernel that recomputes
the forward *inside* the kernel under ``jax.vjp`` and emits gradients w.r.t.
the differentiable row inputs (continuous input, context, and — pulse rep —
the phase features, through which t_nd gradients flow). That covers the
NUTS potential (theta gradients flow through the context/features; the data
and network weights are constants there). Parameter gradients are NOT
provided — training keeps the plain-XLA ``MNLE.log_prob_fn`` path.

Parity: the kernel shares the spline math with ``nets/spline.py``
(``use_gather=False`` masked-knot-lookup variants) and the layer structure
of ``nets/mnle_net.MNLENet``; ``tests/test_mnle_pallas.py`` checks value and
gradient parity against the XLA path in interpret mode on CPU and compiled
on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..nets.spline import (
    num_circular_spline_params,
    num_spline_params,
    rq_spline_circular,
    rq_spline_forward,
)

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
    weight list: cat layers, trunk layers, (pulse rep) slot head, then the
    concatenated spline heads (one (in, T*S) matrix + bias)."""
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
    if cfg.rt_rep == "pulse":
        d = p["pulse_slot_head"]
        ws += [jnp.asarray(d["kernel"]), jnp.asarray(d["bias"]).reshape(1, -1)]
    head_Ws = [
        jnp.asarray(p[f"spline_head_{i}"]["kernel"])
        for i in range(cfg.num_transforms)
    ]
    head_bs = [
        jnp.asarray(p[f"spline_head_{i}"]["bias"])
        for i in range(cfg.num_transforms)
    ]
    if cfg.cond_affine and cfg.rt_rep != "pulse":
        # (mu, log_sigma) columns ride the same head matmul: layout
        # (in, T*S + 2), sliced off in _rows_logp.
        head_Ws.append(jnp.asarray(p["affine_head"]["kernel"]))
        head_bs.append(jnp.asarray(p["affine_head"]["bias"]))
    head_W = jnp.concatenate(head_Ws, axis=1)
    head_b = jnp.concatenate(head_bs)
    ws += [head_W, head_b.reshape(1, -1)]
    return ws


def _shared_heads(arrs_oh_ctx, weights, n_layers):
    """Categorical log-prob + flow-trunk embedding, shared by both reps."""
    oh, ctx = arrs_oh_ctx
    cat = weights[: 2 * n_layers]
    trunk = weights[2 * n_layers : 4 * n_layers]

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
    return cat_lp, emb


def _rows_logp(t, oh, ctx, weights, *, n_layers, num_transforms, num_bins,
               tail_bound, censored_col=None, cond_affine=False):
    """Per-row MNLE log p for rt_rep="log" on standardized inputs.

    t: (B,), oh: (B, C), ctx: (B, D). Shared by the forward kernel, the
    recompute-VJP backward kernel, and (with the XLA spline) parity tests.
    """
    cat_lp, emb = _shared_heads((oh, ctx), weights, n_layers)
    head_W, head_b = weights[4 * n_layers], weights[4 * n_layers + 1]
    sp = _dense(emb, head_W, head_b)  # (B, T*(3K-1) [+ 2 if cond_affine])

    S = num_spline_params(num_bins)
    z = t
    log_det = jnp.zeros_like(t)
    if cond_affine:
        # Conditional location-scale before the spline chain — same math
        # and clipping as MNLENet._flow_params (parity-tested).
        mu = sp[:, num_transforms * S]
        ls = jnp.clip(sp[:, num_transforms * S + 1], -7.0, 7.0)
        z = (z - mu) * jnp.exp(-ls)
        log_det = log_det - ls
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


def _rows_logp_pulse(phi, oh, ctx, kf, kv, weights, *, n_layers,
                     num_transforms, num_bins, num_slots, censored_col):
    """Per-row log p for rt_rep="pulse", grid_anchor="absolute".

    phi: (B,) within-slot phase; kf: (B, F) flow-head features; kv: (B,)
    slot index as float. Outer change-of-variables (-log Delta) is added by
    the wrapper.
    """
    cat_lp, emb = _shared_heads((oh, ctx), weights, n_layers)
    slot_W, slot_b = weights[4 * n_layers], weights[4 * n_layers + 1]
    head_W, head_b = weights[4 * n_layers + 2], weights[4 * n_layers + 3]

    slot_logits = jax.nn.log_softmax(_dense(emb, slot_W, slot_b), axis=-1)
    # Integer iota (Mosaic rejects float iota results); kv arrives as float.
    iota = jax.lax.broadcasted_iota(jnp.int32, slot_logits.shape, 1)
    slot_lp = jnp.sum(
        jnp.where(iota == kv[:, None].astype(jnp.int32), slot_logits, 0.0),
        axis=-1,
    )

    sp = _dense(jnp.concatenate([emb, kf], axis=-1), head_W, head_b)
    S = num_circular_spline_params(num_bins)
    z = phi
    log_det = jnp.zeros_like(phi)
    for i in range(num_transforms):
        z, ld = rq_spline_circular(
            z, sp[:, i * S : (i + 1) * S], num_bins=num_bins, use_gather=False
        )
        log_det = log_det + ld
    # uniform base: log p(z) = 0
    return cat_lp + (1.0 - oh[:, censored_col]) * (slot_lp + log_det)


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
    pulse = cfg.rt_rep == "pulse"
    if pulse and cfg.grid_anchor != "absolute":
        raise ValueError(
            "fused kernel supports rt_rep='pulse' only with "
            "grid_anchor='absolute' (the tnd anchor stays on the XLA path)"
        )
    # Fixed, modest block sizes: Mosaic's compile time AND its scoped-VMEM
    # stack both scale with rows-per-block through the unrolled
    # 10-transform spline graph (the recompute-VJP backward holds every
    # transform's residuals at once — 24 MB at 128 rows, vs the 16 MB
    # default limit). Small blocks + a grid keep compiles fast and memory
    # bounded; the grid pipelines, so throughput is unaffected.
    _compiler_params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    C = cfg.num_categories

    if pulse:
        n_feat = 3  # slot index + sin/cos phase of t_nd
        rows_kwargs = dict(
            n_layers=n_layers,
            num_transforms=cfg.num_transforms,
            num_bins=cfg.num_bins,
            num_slots=cfg.num_pulse_slots,
            censored_col=cfg.censored_category,
        )

        def rows_fn(arrs, ws):
            phi2, oh, ctx, kf, kv2 = arrs
            return _rows_logp_pulse(
                phi2[:, 0], oh, ctx, kf, kv2[:, 0], ws, **rows_kwargs
            )

        # input arrays: (t2, oh, ctx, kf, kv2); diff w.r.t. t2, ctx, kf.
        in_widths = [1, C, None, n_feat, 1]  # None = ctx width (runtime)
        diff_mask = [True, False, True, True, False]
    else:
        rows_kwargs = dict(
            n_layers=n_layers,
            num_transforms=cfg.num_transforms,
            num_bins=cfg.num_bins,
            tail_bound=cfg.tail_bound,
            censored_col=cfg.censored_category if cfg.censor_rt else None,
            cond_affine=cfg.cond_affine,
        )

        def rows_fn(arrs, ws):
            t2, oh, ctx = arrs
            return _rows_logp(t2[:, 0], oh, ctx, ws, **rows_kwargs)

        in_widths = [1, C, None]
        diff_mask = [True, False, True]

    n_in = len(diff_mask)
    diff_idx = [i for i, m in enumerate(diff_mask) if m]

    def _fwd_kernel(*refs):
        out_ref = refs[-1]
        arrs = [r[:] for r in refs[:n_in]]
        ws = [r[:] for r in refs[n_in:-1]]
        out_ref[:, 0] = rows_fn(arrs, ws)

    def _bwd_kernel(*refs):
        n_out = len(diff_idx)
        out_refs = refs[-n_out:]
        arrs = [r[:] for r in refs[:n_in]]
        g = refs[n_in][:, 0]
        ws = [r[:] for r in refs[n_in + 1 : len(refs) - n_out]]

        def f(*diff_arrs):
            full = list(arrs)
            for j, i in enumerate(diff_idx):
                full[i] = diff_arrs[j]
            return rows_fn(full, ws)

        _, vjp = jax.vjp(f, *[arrs[i] for i in diff_idx])
        grads = vjp(g)
        for r, gr in zip(out_refs, grads):
            r[:] = gr

    def _round8(n):
        return ((n + 7) // 8) * 8  # f32 sublane multiple

    def _pad_rows(arr, pad):
        return jnp.pad(arr, ((0, pad), (0, 0))) if pad else arr

    def _specs(arrs, B):
        return [
            pl.BlockSpec(
                (B, a.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM
            )
            for a in arrs
        ]

    _w_specs = [
        pl.BlockSpec(w.shape, lambda i, nd=w.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for w in weights
    ]

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
    def _pallas_fwd(*arrs):
        N = arrs[0].shape[0]
        B = min(block_rows, _round8(N))
        n_blocks = pl.cdiv(N, B)
        pad = n_blocks * B - N
        arrs = [_pad_rows(a, pad) for a in arrs]
        out = pl.pallas_call(
            _fwd_kernel,
            grid=(n_blocks,),
            in_specs=_specs(arrs, B) + _w_specs,
            out_specs=pl.BlockSpec(
                (B, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((N + pad, 1), jnp.float32),
            compiler_params=None if interpret else _compiler_params,
            interpret=interpret,
        )(*arrs, *weights)
        return out[:N, 0]

    @_pallas_fwd.def_vmap
    def _pallas_fwd_vmap(axis_size, in_batched, *arrs):
        n = arrs[list(in_batched).index(True)].shape[1]
        arrs = _flatten_batch(axis_size, in_batched, arrs)
        return _pallas_fwd(*arrs).reshape(axis_size, n), True

    @jax.custom_batching.custom_vmap
    def _pallas_bwd(*arrs_g):
        arrs, g2 = arrs_g[:-1], arrs_g[-1]
        N = arrs[0].shape[0]
        B = min(block_rows_bwd, _round8(N))
        n_blocks = pl.cdiv(N, B)
        pad = n_blocks * B - N
        arrs = [_pad_rows(a, pad) for a in arrs]
        g2 = _pad_rows(g2, pad)
        outs = pl.pallas_call(
            _bwd_kernel,
            grid=(n_blocks,),
            in_specs=_specs(arrs, B) + _specs([g2], B) + _w_specs,
            out_specs=[
                pl.BlockSpec(
                    (B, arrs[i].shape[1]), lambda i_: (i_, 0),
                    memory_space=pltpu.VMEM,
                )
                for i in diff_idx
            ],
            out_shape=[
                jax.ShapeDtypeStruct((N + pad, arrs[i].shape[1]), jnp.float32)
                for i in diff_idx
            ],
            compiler_params=None if interpret else _compiler_params,
            interpret=interpret,
        )(*arrs, g2, *weights)
        return tuple(o[:N] for o in outs)

    @_pallas_bwd.def_vmap
    def _pallas_bwd_vmap(axis_size, in_batched, *arrs_g):
        n = arrs_g[list(in_batched).index(True)].shape[1]
        flat = _flatten_batch(axis_size, in_batched, arrs_g)
        outs = _pallas_bwd(*flat)
        return (
            tuple(o.reshape((axis_size, n) + o.shape[1:]) for o in outs),
            tuple(True for _ in outs),
        )

    @jax.custom_vjp
    def fused_rows(*arrs):
        return _pallas_fwd(*[a if a.ndim == 2 else a[:, None] for a in arrs])

    def fused_fwd(*arrs):
        return fused_rows(*arrs), arrs

    def fused_bwd(res, g):
        arrs2 = [a if a.ndim == 2 else a[:, None] for a in res]
        grads2 = _pallas_bwd(*arrs2, g[:, None])
        grads = [jnp.zeros_like(a) for a in res]
        for j, i in enumerate(diff_idx):
            gr = grads2[j]
            grads[i] = gr[:, 0] if res[i].ndim == 1 else gr
        return tuple(grads)

    fused_rows.defvjp(fused_fwd, fused_bwd)

    # ---- outer transforms (identical math to MNLE.log_prob_fn) ------------
    est = estimator
    from ..nets.mnle_net import (
        MNLENet,
        _slot_features,
        pulse_grid_split,
        shifted_rt_transform,
        tail_sharp_transform,
        transform_condition,
    )

    def log_prob(x, condition):
        x = jnp.asarray(x, jnp.float32)
        condition = jnp.asarray(condition, jnp.float32)
        batch_shape = jnp.broadcast_shapes(x.shape[:-1], condition.shape[:-1])
        x = jnp.broadcast_to(x, batch_shape + x.shape[-1:])
        condition = jnp.broadcast_to(condition, batch_shape + condition.shape[-1:])

        rt = x[..., 0]
        choice = x[..., 1].astype(jnp.int32)
        c = transform_condition(cfg, condition)
        if cfg.z_score_theta:
            c = (c - est.cond_mean) / est.cond_std
        onehot = jax.nn.one_hot(choice, cfg.num_categories)
        ctx = est._net.apply(
            {"params": est.params}, c, condition, method=MNLENet.make_context
        )
        n = int(np.prod(batch_shape)) if batch_shape else 1

        if pulse:
            t_nd = condition[..., cfg.tnd_index]
            k, phi, _, ds, _ = pulse_grid_split(cfg, rt, t_nd)
            kf = _slot_features(cfg, k, t_nd, jnp.float32)
            not_cens = (choice != cfg.censored_category).astype(jnp.float32)
            lp = fused_rows(
                phi.reshape(n),
                onehot.reshape(n, cfg.num_categories),
                ctx.reshape(n, ctx.shape[-1]),
                kf.reshape(n, kf.shape[-1]),
                k.astype(jnp.float32).reshape(n),
            )
            return lp.reshape(batch_shape) + not_cens * ds

        log_det = jnp.zeros_like(rt)
        t = rt
        if cfg.rt_rep == "shifted_log":
            t, ld, barrier = shifted_rt_transform(cfg, rt, condition)
            log_det = log_det + ld + barrier
        elif cfg.log_transform_x:
            t_safe = jnp.maximum(t, 1e-37)
            log_det = log_det - jnp.log(t_safe)
            t = jnp.log(t_safe)
        if cfg.z_score_x:
            t = (t - est.x_mean) / est.x_std
            log_det = log_det - jnp.log(est.x_std)
        if cfg.tail_sharp_k > 0:
            # Left-tail sharpening rides OUTSIDE the kernel (it transforms
            # the standardized coordinate the kernel consumes), so the
            # fused spline math is untouched; see
            # nets/mnle_net.tail_sharp_transform.
            t, ld_s = tail_sharp_transform(cfg, t)
            log_det = log_det + ld_s
        if cfg.censor_rt:
            # Censored rows carry no RT terms at all (kernel masks the
            # in-kernel spline log-det + base; the outer change-of-variables
            # correction + onset barrier are masked here).
            log_det = jnp.where(choice == cfg.censored_category, 0.0, log_det)

        lp = fused_rows(
            t.reshape(n),
            onehot.reshape(n, cfg.num_categories),
            ctx.reshape(n, ctx.shape[-1]),
        )
        return lp.reshape(batch_shape) + log_det

    return log_prob
