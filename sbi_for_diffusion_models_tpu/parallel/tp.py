"""Tensor-parallel sharding rules for the MNLE estimator.

The reference has no tensor parallelism (its net is a 128-hidden MLP+flow,
far below TP scale — SURVEY.md section 2.3), but the framework supports it for
scaled-up estimators: Megatron-style alternating column/row-parallel Dense
layers expressed as PartitionSpecs. XLA's SPMD partitioner inserts the
all-reduces over the mesh's "model" axis; combined with a "data" axis this
gives dp x tp training of the density estimator on a 2-D mesh.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["mnle_tp_specs", "make_tp_train_step"]


def mnle_tp_specs(params: Any, mesh: Mesh, model_axis: str = "model"):
    """PartitionSpec tree for MNLE params on a mesh with a ``model`` axis.

    Rule: a 2-D Dense kernel (d_in, d_out) is column-parallel (output dim
    sharded) when d_out divides evenly and is wide enough, else row-parallel
    on d_in, else replicated. 1-D biases follow their kernel's output
    sharding. Alternating col/row across consecutive layers keeps activations
    local between them; where they do not alternate XLA inserts the
    collectives.
    """
    n = mesh.shape[model_axis]

    def spec_for(path, leaf):
        name = jax.tree_util.keystr(path)
        if leaf.ndim == 2:
            d_in, d_out = leaf.shape
            if d_out % n == 0 and d_out >= 2 * n:
                return P(None, model_axis)
            if d_in % n == 0 and d_in >= 2 * n:
                return P(model_axis, None)
            return P()
        if leaf.ndim == 1 and "bias" in name:
            d = leaf.shape[0]
            if d % n == 0 and d >= 2 * n:
                return P(model_axis)
            return P()
        return P()

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    return jax.tree_util.tree_unflatten(
        treedef, [spec_for(path, leaf) for path, leaf in flat]
    )


def make_tp_train_step(
    loss_fn,
    tx,
    mesh: Mesh,
    param_specs,
    data_axis: str = "data",
):
    """dp x tp training step: batch sharded on ``data``, params sharded per
    ``param_specs`` over the ``model`` axis. Returns jitted
    ``step(params, opt_state, x, z) -> (params, opt_state, loss)``.
    """
    import optax

    param_sh = jax.tree.map(lambda s: NamedSharding(mesh, s), param_specs)
    batch_sh = NamedSharding(mesh, P(data_axis))
    scalar_sh = NamedSharding(mesh, P())

    # opt_state's tree (adam mu/nu + scalar count) mirrors params where it
    # matters; None lets the partitioner propagate the param shardings into it.
    @partial(
        jax.jit,
        in_shardings=(param_sh, None, batch_sh, batch_sh),
        out_shardings=(param_sh, None, scalar_sh),
    )
    def step(params, opt_state, x, z):
        loss, grads = jax.value_and_grad(loss_fn)(params, x, z)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step
