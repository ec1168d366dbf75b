"""Mesh scale-out on the 8-fake-device CPU mesh: sharded sim == unsharded,
data-parallel training step, chain-sharded NUTS."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sbi_for_diffusion_models_tpu.nets.mnle_net import MNLEConfig, build_mnle
from sbi_for_diffusion_models_tpu.ops.ddm_scan import ddm_rt_choice_scan
from sbi_for_diffusion_models_tpu.parallel.mesh import (
    default_mesh,
    make_dp_train_step,
    pad_to_multiple,
    replicate,
    shard_leading,
    sharded_run_nuts,
    sharded_simulate,
)

SIM_KW = dict(n_max=80, steps_per_pulse=20, chunk_steps=20, t_max=8.0)


def _inputs(n):
    key = jax.random.key(0)
    theta = jnp.tile(jnp.array([[0.5, 0.5, 1.0, 2.0, 0.1]], jnp.float32), (n, 1))
    pulses = jnp.where(jax.random.uniform(key, (n, 4)) < 0.75, 1.0, -1.0)
    return theta, pulses


def test_sharded_simulate_matches_unsharded():
    theta, pulses = _inputs(64)
    key = jax.random.key(7)
    ref = ddm_rt_choice_scan(theta, pulses, key, **SIM_KW)
    mesh = default_mesh()
    out = sharded_simulate(ddm_rt_choice_scan, theta, pulses, key, mesh=mesh, **SIM_KW)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


def test_sharded_simulate_pads_ragged_batch():
    theta, pulses = _inputs(13)  # not divisible by 8
    out = sharded_simulate(
        ddm_rt_choice_scan, theta, pulses, jax.random.key(1), **SIM_KW
    )
    assert out.shape == (13, 2)


def test_pad_to_multiple():
    a = jnp.arange(10).reshape(5, 2)
    p, n = pad_to_multiple(a, 4)
    assert p.shape == (8, 2) and n == 5
    p2, n2 = pad_to_multiple(a, 5)
    assert p2 is a and n2 == 5


def test_dp_train_step_runs_and_improves_loss():
    mesh = default_mesh()
    cfg = MNLEConfig(condition_dim=9, hidden_features=16, num_transforms=2, num_bins=5)
    est = build_mnle(jax.random.key(0), cfg)
    theta, pulses = _inputs(64)
    x = ddm_rt_choice_scan(theta, pulses, jax.random.key(2), **SIM_KW)
    z = jnp.concatenate([theta, pulses], -1)

    def loss_fn(params, x, z):
        return -jnp.mean(est.log_prob_fn(params, x, z))

    tx = optax.adam(1e-2)
    step = make_dp_train_step(loss_fn, tx, mesh)
    params = replicate(est.params, mesh)
    opt_state = replicate(tx.init(est.params), mesh)
    x_s, z_s = shard_leading(x, mesh), shard_leading(z, mesh)
    losses = []
    for _ in range(12):
        params, opt_state, loss = step(params, opt_state, x_s, z_s)
        losses.append(float(loss))
    assert losses[-1] < losses[0], f"loss did not improve: {losses}"


def test_chain_sharded_nuts():
    mesh = default_mesh(axis_name="chains")

    def logp(u):
        return -0.5 * jnp.sum((u - 2.0) ** 2)

    init = jax.random.normal(jax.random.key(3), (8, 3))
    samples, info = sharded_run_nuts(
        jax.random.key(4), logp, init, mesh=mesh,
        num_warmup=150, num_samples=300, max_depth=6,
    )
    s = np.asarray(samples).reshape(-1, 3)
    np.testing.assert_allclose(s.mean(0), 2.0, atol=0.15)


def test_tp_train_step_2d_mesh():
    """dp x tp on a (4, 2) mesh: sharded params train and loss improves."""
    import numpy as _np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from sbi_for_diffusion_models_tpu.parallel.tp import (
        make_tp_train_step,
        mnle_tp_specs,
    )

    mesh = Mesh(_np.array(jax.devices()).reshape(4, 2), ("data", "model"))
    cfg = MNLEConfig(condition_dim=9, hidden_features=16, num_transforms=2, num_bins=5)
    est = build_mnle(jax.random.key(0), cfg)
    specs = mnle_tp_specs(est.params, mesh)
    # At least the hidden Dense kernels must actually be sharded.
    sharded = [s for s in jax.tree.leaves(specs, is_leaf=lambda x: isinstance(x, P)) if s != P()]
    assert len(sharded) > 0

    theta, pulses = _inputs(64)
    x = ddm_rt_choice_scan(theta, pulses, jax.random.key(2), **SIM_KW)
    z = jnp.concatenate([theta, pulses], -1)

    def loss_fn(params, x, z):
        return -jnp.mean(est.log_prob_fn(params, x, z))

    tx = optax.adam(1e-2)
    step = make_tp_train_step(loss_fn, tx, mesh, specs)
    params = jax.device_put(
        est.params, jax.tree.map(lambda s: NamedSharding(mesh, s), specs)
    )
    opt_state = tx.init(params)
    x_s = jax.device_put(x, NamedSharding(mesh, P("data")))
    z_s = jax.device_put(z, NamedSharding(mesh, P("data")))
    losses = []
    for _ in range(8):
        params, opt_state, loss = step(params, opt_state, x_s, z_s)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_multihost_single_process_semantics():
    """initialize_multihost is a no-op without a coordinator; global_mesh
    spans all (fake) devices and matches default_mesh."""
    from sbi_for_diffusion_models_tpu.parallel.multihost import (
        global_mesh,
        initialize_multihost,
        is_multihost,
        process_info,
    )

    info = initialize_multihost()
    assert not is_multihost()
    assert info["process_count"] == 1
    assert info["global_device_count"] == jax.device_count()
    m = global_mesh("data")
    assert m.devices.size == jax.device_count()
    assert m.axis_names == ("data",)
    assert info == process_info()
