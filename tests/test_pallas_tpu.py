"""Pallas kernel parity vs the XLA scan kernel — TPU-only.

The hardware PRNG has no CPU emulation, so these run only when the suite is
invoked on the real chip: ``SDM_TEST_TPU=1 python -m pytest
tests/test_pallas_tpu.py`` (one TPU process at a time; see CLAUDE.md).
Parity is distributional (different RNG streams, same model).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="pallas hardware PRNG needs a TPU"
)


def _inputs(N, P=80, seed=0):
    key = jax.random.key(seed)
    theta = jnp.stack(
        [
            jax.random.beta(jax.random.fold_in(key, 0), 2.0, 2.0, (N,)),
            jnp.exp(-1.0 + jax.random.normal(jax.random.fold_in(key, 1), (N,))),
            jnp.exp(jax.random.normal(jax.random.fold_in(key, 2), (N,))),
            jnp.exp(2.75 + 0.5 * jax.random.normal(jax.random.fold_in(key, 3), (N,))),
            jax.random.beta(jax.random.fold_in(key, 4), 2.0, 2.0, (N,)),
        ],
        axis=-1,
    ).astype(jnp.float32)
    pulses = jnp.where(jax.random.uniform(jax.random.fold_in(key, 5), (N, P)) < 0.75, 1.0, -1.0)
    return theta, pulses


def test_pallas_matches_scan_distribution():
    from sbi_for_diffusion_models_tpu.ops.ddm_pallas import ddm_rt_choice_pallas
    from sbi_for_diffusion_models_tpu.ops.ddm_scan import ddm_rt_choice_scan

    N = 65536
    theta, pulses = _inputs(N)
    xp = np.asarray(ddm_rt_choice_pallas(theta, pulses, jax.random.key(1)))
    xs = np.asarray(ddm_rt_choice_scan(theta, pulses, jax.random.key(2)))
    fp = np.bincount(xp[:, 1].astype(int), minlength=3) / N
    fs = np.bincount(xs[:, 1].astype(int), minlength=3) / N
    np.testing.assert_allclose(fp, fs, atol=0.01)
    qp = np.quantile(xp[:, 0], [0.1, 0.25, 0.5, 0.75, 0.9])
    qs = np.quantile(xs[:, 0], [0.1, 0.25, 0.5, 0.75, 0.9])
    np.testing.assert_allclose(qp, qs, rtol=0.03)


def test_pallas_deterministic_given_key():
    from sbi_for_diffusion_models_tpu.ops.ddm_pallas import ddm_rt_choice_pallas

    theta, pulses = _inputs(8192)
    a = np.asarray(ddm_rt_choice_pallas(theta, pulses, jax.random.key(7)))
    b = np.asarray(ddm_rt_choice_pallas(theta, pulses, jax.random.key(7)))
    c = np.asarray(ddm_rt_choice_pallas(theta, pulses, jax.random.key(8)))
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_pallas_collapsing_bounds():
    from sbi_for_diffusion_models_tpu.ops.ddm_pallas import ddm_rt_choice_pallas

    N = 8192
    theta = jnp.tile(jnp.array([[0.5, 0.1, 0.05, 8.0, 0.0]], jnp.float32), (N, 1))
    pulses = jnp.ones((N, 80), jnp.float32)
    fixed = np.asarray(
        ddm_rt_choice_pallas(theta, pulses, jax.random.key(0), collapse_rate=0.0)
    )
    coll = np.asarray(
        ddm_rt_choice_pallas(theta, pulses, jax.random.key(0), collapse_rate=5.0)
    )
    assert coll[:, 0].mean() < fixed[:, 0].mean()


def test_fused_mnle_logprob_compiled_parity():
    """The fused MNLE kernel must compile on the real chip and match the XLA
    path in value and theta-gradient (exact math, same float32 ops)."""
    from sbi_for_diffusion_models_tpu.nets.mnle_net import MNLEConfig, build_mnle

    est = build_mnle(jax.random.key(0), MNLEConfig(condition_dim=85))
    fused = est.dispatch_log_prob("pallas")
    T = 50
    theta, pulses = _inputs(T)
    x = jnp.stack(
        [jnp.exp(0.3 * jax.random.normal(jax.random.key(1), (T,))),
         jax.random.randint(jax.random.key(2), (T,), 0, 3).astype(jnp.float32)],
        -1,
    )
    cond = jnp.concatenate([theta, pulses], -1)
    ref = np.asarray(est.log_prob_fn(est.params, x, cond))
    got = np.asarray(jax.jit(fused)(x, cond))
    # The XLA reference runs its matmuls at the TPU default (bf16 passes);
    # the kernel runs HIGHEST precision — tolerances cover that gap.
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)

    th0 = theta[0]

    def pot(fn, th):
        c = jnp.concatenate([jnp.broadcast_to(th, (T, 5)), pulses], -1)
        return jnp.sum(fn(x, c))

    g_ref = np.asarray(jax.grad(lambda t: pot(
        lambda a, b: est.log_prob_fn(est.params, a, b), t))(th0))
    g_fused = np.asarray(jax.jit(jax.grad(lambda t: pot(fused, t)))(th0))
    np.testing.assert_allclose(
        g_fused, g_ref, rtol=3e-2, atol=3e-2,
        err_msg="XLA side uses default-precision (bf16-pass) matmuls",
    )


def test_fused_mnle_vmapped_chain_grads():
    """NUTS vmaps value_and_grad over chains; the fused op must lower under
    vmap on the real chip (Mosaic batches the row grid)."""
    from sbi_for_diffusion_models_tpu.nets.mnle_net import MNLEConfig, build_mnle

    est = build_mnle(jax.random.key(3), MNLEConfig(condition_dim=85))
    fused = est.dispatch_log_prob("pallas")
    T, C = 50, 16
    theta, pulses = _inputs(T, seed=4)
    x = jnp.stack(
        [jnp.exp(0.3 * jax.random.normal(jax.random.key(5), (T,))),
         jax.random.randint(jax.random.key(6), (T,), 0, 3).astype(jnp.float32)],
        -1,
    )

    def pot(fn, th):
        c = jnp.concatenate([jnp.broadcast_to(th, (T, 5)), pulses], -1)
        return jnp.sum(fn(x, c))

    ths = theta[:C]
    # NB the reference must be jitted: EAGER vmapped grads on the axon
    # platform disagree with their own jitted version by O(100) (observed;
    # platform quirk), while jitted XLA, per-chain loop, and the fused
    # kernel all agree to f32 reorder noise.
    v_ref, g_ref = jax.jit(jax.vmap(
        jax.value_and_grad(lambda t: pot(lambda a, b: est.log_prob_fn(est.params, a, b), t))
    ))(ths)
    v_f, g_f = jax.jit(jax.vmap(jax.value_and_grad(lambda t: pot(fused, t))))(ths)
    np.testing.assert_allclose(np.asarray(v_f), np.asarray(v_ref), rtol=2e-4)
    g_f, g_ref = np.asarray(g_f), np.asarray(g_ref)
    # Element tolerance can be exceeded by rare knot-boundary bin flips: an
    # input within f32 rounding of a spline knot may land in adjacent bins
    # under the two (mathematically identical) knot computations; the spline
    # is continuous there but its derivative jumps. Require near-universal
    # elementwise agreement plus essentially exact gradient direction.
    bad = np.abs(g_f - g_ref) > 0.05 + 5e-3 * np.abs(g_ref)
    assert bad.mean() <= 0.05, f"{bad.sum()}/{bad.size} grad elements mismatch"
    cos = (g_f * g_ref).sum(-1) / (
        np.linalg.norm(g_f, axis=-1) * np.linalg.norm(g_ref, axis=-1)
    )
    assert cos.min() > 0.9999, f"gradient direction diverged: cos={cos.min()}"
