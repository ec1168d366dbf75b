"""Pulse-DDM Euler-Maruyama as a fused Pallas TPU kernel.

The XLA scan kernel (``ddm_scan.py``) is HBM-bound: the per-step carry and the
bulk-generated noise round-trip HBM every step (~100 GB per 131k-trial batch).
This kernel keeps the whole trial state resident in VMEM, generates noise
in-register with the TPU hardware PRNG (Box-Muller), and early-exits per trial
tile — the only HBM traffic is one read of (theta, stimulus) and one write of
(rt, choice).

Semantics match the reference math exactly (reference:
src/sbi_for_diffusion_models/models/rt_choice_model.py:131-221): leak +
diffusion step, pulse kick every ``steps_per_pulse`` steps, absorbing bounds
{0, B} with first-hit step ``t+1``, per-trial decision window from ``t_nd``,
censoring to choice 2, RT clamping — but with a different (hardware) PRNG
stream, so parity with the scan kernel is distributional, not bitwise.

Layout: trials are tiled to (R, 128) VPU blocks. Host-side, the (N, 5) theta
and (N, P) stimulus are rearranged to (G, 5, R, 128) and (G, P, R, 128) so the
kernel indexes a full (R, 128) tile per parameter / per pulse with no
in-kernel relayout.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import DT_CHOICE, T_MAX

__all__ = ["ddm_rt_choice_pallas"]

_TWO_PI = 2.0 * math.pi


def _normal_pair(shape):
    """TWO independent standard-normal tiles from one Box-Muller transform
    (z1 = r cos, z2 = r sin share the log and sqrt — 1 log + 1 sqrt + 1 sin +
    1 cos per two normals instead of per one).

    prng_random_bits yields (signed) int32; use a *logical* shift to get the
    top 24 bits as a non-negative value before the float convert.
    """
    bits = pltpu.prng_random_bits((2,) + shape)
    b1 = jax.lax.shift_right_logical(bits[0], 8)
    b2 = jax.lax.shift_right_logical(bits[1], 8)
    u1 = b1.astype(jnp.float32) * (1.0 / (1 << 24)) + (
        0.5 / (1 << 24)
    )  # uniform in (0, 1), bounded away from 0
    u2 = b2.astype(jnp.float32) * (1.0 / (1 << 24))
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    ang = _TWO_PI * u2
    return r * jnp.cos(ang), r * jnp.sin(ang)


def _kernel(
    seed_ref,  # SMEM (1,) int32
    theta_ref,  # VMEM (1, 5, R, 128)
    s_ref,  # VMEM (1, P, R, 128)
    out_ref,  # VMEM (1, 2, R, 128)
    *,
    R: int,
    P: int,
    n_max: int,
    steps_per_pulse: int,
    dt: float,
    t_max: float,
    sigma: float,
    collapse_rate: float,
):
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))

    a0_frac = jnp.clip(theta_ref[0, 0], 0.0, 1.0)
    lam = theta_ref[0, 1]
    v = jnp.abs(theta_ref[0, 2])
    B = jnp.maximum(jnp.abs(theta_ref[0, 3]), 1e-6)
    t_nd = jnp.clip(theta_ref[0, 4], 0.0, t_max - 1e-6)

    dtf = jnp.float32(dt)
    sig_sqrt_dt = jnp.float32(sigma * math.sqrt(dt))
    n_steps = jnp.clip(
        jnp.floor((t_max - t_nd) / dtf).astype(jnp.int32), 0, n_max
    )

    n_chunks = n_max // steps_per_pulse
    a_init = a0_frac * B
    hit_step_init = jnp.zeros((R, 128), jnp.int32)
    choice_init = jnp.zeros((R, 128), jnp.int32)

    def chunk_cond(state):
        c, a, hit_step, choice = state
        any_active = jnp.any((hit_step == 0) & (c * steps_per_pulse < n_steps))
        return (c < n_chunks) & any_active

    def chunk_body(state):
        c, a, hit_step, choice = state
        t0 = c * steps_per_pulse
        kick = v * s_ref[0, c]

        if collapse_rate > 0.0:
            crate = jnp.float32(collapse_rate)
        else:
            crate = None

        def one_step(t, is_pulse_step, eps, st):
            a, hit_step, choice = st
            active = (hit_step == 0) & (t < n_steps)

            # Leak + diffusion, unmasked as in the reference (post-hit values
            # are never read back). reference rt_choice_model.py:186-187.
            a = a + (-lam * a) * dtf + eps * sig_sqrt_dt
            # Pulse kick on the first step of the (pulse-aligned) chunk.
            if is_pulse_step:
                a = jnp.where(active, a + kick, a)

            if crate is not None:
                f = 0.5 + 0.5 * jnp.exp(-crate * (t.astype(jnp.float32) * dtf))
                upper = B * f
                lower = B * (1.0 - f)
            else:
                upper = B
                lower = 0.0

            hit_up = active & (a >= upper)
            hit_lo = active & (a <= lower)
            newly = hit_up | hit_lo
            hit_step = jnp.where(newly, t + 1, hit_step)
            choice = jnp.where(hit_up, 1, jnp.where(hit_lo, 0, choice))
            return a, hit_step, choice

        # The pulse-kick step (local i == 0), alone so the remaining loop body
        # is pulse-free; then pairs of steps sharing one Box-Muller draw.
        eps0, eps1 = _normal_pair((R, 128))
        st = one_step(t0, True, eps0, (a, hit_step, choice))
        st = one_step(t0 + 1, False, eps1, st)

        def step_pair(j, st):
            t = t0 + 2 * j
            e0, e1 = _normal_pair((R, 128))
            st = one_step(t, False, e0, st)
            st = one_step(t + 1, False, e1, st)
            return st

        a, hit_step, choice = jax.lax.fori_loop(
            1, steps_per_pulse // 2, step_pair, st
        )
        return c + 1, a, hit_step, choice

    _, a, hit_step, choice = jax.lax.while_loop(
        chunk_cond, chunk_body, (jnp.int32(0), a_init, hit_step_init, choice_init)
    )

    # Censoring + RT (reference rt_choice_model.py:206-218).
    hit = hit_step > 0
    hit_step = jnp.where(hit, hit_step, n_steps)
    outcome = jnp.where(hit, choice, 2)
    rt = jnp.clip(t_nd + hit_step.astype(jnp.float32) * dtf, 1e-6, t_max)
    out_ref[0, 0] = rt
    out_ref[0, 1] = outcome.astype(jnp.float32)


@partial(
    jax.jit,
    static_argnames=(
        "mu_sensory",
        "collapse_rate",
        "dt",
        "t_max",
        "steps_per_pulse",
        "n_max",
        "tile_rows",
        "interpret",
    ),
)
def ddm_rt_choice_pallas(
    theta: jnp.ndarray,
    pulse_sides: jnp.ndarray,
    key: jax.Array,
    *,
    mu_sensory: float = 1.0,
    collapse_rate: float = 0.0,
    dt: float = float(DT_CHOICE),
    t_max: float = float(T_MAX),
    steps_per_pulse: int = 200,
    n_max: int | None = None,
    tile_rows: int = 64,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in high-performance twin of ``ddm_rt_choice_scan``.

    theta: (N, 5); pulse_sides: (N, P) with P >= n_max/steps_per_pulse;
    returns (N, 2) float32 [rt, choice], choice in {0, 1, 2}.
    """
    if n_max is None:
        n_max = int(t_max / dt)
    if n_max % steps_per_pulse != 0:
        raise ValueError(
            f"n_max={n_max} must be divisible by steps_per_pulse={steps_per_pulse}"
        )
    if steps_per_pulse % 2 != 0:
        raise ValueError(
            f"steps_per_pulse={steps_per_pulse} must be even (the kernel "
            "consumes Box-Muller normal pairs, two steps per draw)"
        )
    n_chunks = n_max // steps_per_pulse

    theta = jnp.asarray(theta, jnp.float32)
    s = jnp.asarray(pulse_sides, jnp.float32)
    N = theta.shape[0]
    if s.shape[1] < n_chunks:
        raise ValueError(
            f"pulse_sides has P={s.shape[1]} < n_chunks={n_chunks}"
        )
    s = s[:, :n_chunks]
    P = n_chunks

    R = tile_rows
    tile = R * 128
    pad = (-N) % tile
    if pad:
        theta = jnp.pad(theta, ((0, pad), (0, 0)), mode="edge")
        s = jnp.pad(s, ((0, pad), (0, 0)), mode="edge")
    Np = N + pad
    G = Np // tile

    theta4 = theta.reshape(G, R, 128, 5).transpose(0, 3, 1, 2)
    s4 = s.reshape(G, R, 128, P).transpose(0, 3, 1, 2)
    seed = jax.random.randint(key, (1,), 0, 2**31 - 1, jnp.int32)

    kernel = partial(
        _kernel,
        R=R,
        P=P,
        n_max=n_max,
        steps_per_pulse=steps_per_pulse,
        dt=float(dt),
        t_max=float(t_max),
        sigma=float(mu_sensory),
        collapse_rate=float(collapse_rate),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(G,),
            in_specs=[
                pl.BlockSpec(
                    (1, 5, R, 128), lambda g, seed_ref: (g, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, P, R, 128), lambda g, seed_ref: (g, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, 2, R, 128), lambda g, seed_ref: (g, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((G, 2, R, 128), jnp.float32),
        interpret=interpret,
    )(seed, theta4, s4)

    x = out.transpose(0, 2, 3, 1).reshape(Np, 2)
    return x[:N]
