"""Parallel tempering (replica exchange): ladder, swap validity, mode
recovery that plain NUTS fails, MCMCPosterior/SBC wiring, grid-hop bounds.

The tempering tier exists because the pulse-DDM posterior is rugged and
multimodal across (a0, v, B, t_nd) (BENCH_NOTES round-2 "real root cause"):
trajectory samplers get basin-stuck (split-R-hat ~365 with zero
divergences), which breaks the reference's sole correctness oracle — SBC
rank uniformity (reference src/sbi_for_diffusion_models/mnle.py:132-237).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sbi_for_diffusion_models_tpu.distributions import (
    Beta,
    LogNormal,
    MultipleIndependent,
    mcmc_transform,
)
from sbi_for_diffusion_models_tpu.inference.mcmc import MCMCPosterior, make_grid_hop
from sbi_for_diffusion_models_tpu.inference.nuts import (
    ReplicaExchange,
    geometric_ladder,
    run_nuts,
)


def test_geometric_ladder_properties():
    lad = geometric_ladder(5, 0.05)
    assert lad.shape == (5,)
    assert lad[0] == 1.0  # cold rung first == the target posterior
    np.testing.assert_allclose(lad[-1], 0.05, rtol=1e-6)
    assert (np.diff(lad) < 0).all()  # strictly decreasing
    # geometric: constant ratio between adjacent rungs
    np.testing.assert_allclose(np.diff(np.log(lad)), np.diff(np.log(lad))[0])
    # degenerate sizes
    np.testing.assert_array_equal(geometric_ladder(1, 0.1), [1.0])


def _bimodal_ll(u):
    """log p up to const: 0.3 N(-4, .5) + 0.7 N(4, .5) — basins ~16 sigma
    apart, far beyond any NUTS trajectory."""
    a = -0.5 * ((u[0] + 4.0) / 0.5) ** 2 + jnp.log(0.3)
    b = -0.5 * ((u[0] - 4.0) / 0.5) ** 2 + jnp.log(0.7)
    return jnp.logaddexp(a, b)


def test_pt_recovers_bimodal_weights_plain_nuts_fails():
    """All chains start in the SMALL mode. Plain NUTS never crosses; PT
    transports hot-rung crossings down to beta=1 and recovers the weights."""
    R, M, S = 6, 6, 400
    init = jnp.full((M * R, 1), -4.0)

    s_plain, _ = run_nuts(
        jax.random.key(0), lambda u: _bimodal_ll(u), jnp.full((M, 1), -4.0),
        num_warmup=300, num_samples=S, max_depth=6,
    )
    frac_plain = float((np.asarray(s_plain) > 0).mean())
    assert frac_plain < 0.02, f"plain NUTS unexpectedly crossed: {frac_plain}"

    betas = jnp.tile(jnp.asarray(geometric_ladder(R, 0.01), jnp.float32), M)
    ex = ReplicaExchange(
        n_replicas=R, betas=betas, ll_fn=lambda u, b: _bimodal_ll(u),
        swap_every=1,
    )
    s_pt, info = run_nuts(
        jax.random.key(0), lambda u, beta: beta * _bimodal_ll(u), init,
        num_warmup=300, num_samples=S, max_depth=6, data=betas, exchange=ex,
    )
    cold = np.asarray(s_pt).reshape(M, R, S, 1)[:, 0]
    frac_pt = float((cold > 0).mean())
    assert abs(frac_pt - 0.7) < 0.15, f"PT mode weight off: {frac_pt}"
    # the DEO sweeps actually exchanged states
    assert info["swap_accept"] > 0.1


def test_pt_crosses_barrier_the_grid_hop_cannot():
    """The round-2 diagnosis: the t_nd grid hop is "necessary but not
    sufficient" — the ruggedness extends into (a0, v, B), dimensions with no
    known periodic structure to hop along. Model that: two far-apart modes
    in dim 1 while the hop move only shifts dim 0. NUTS + hop stays in the
    start basin; PT (composed with the same hop) recovers both modes."""
    from sbi_for_diffusion_models_tpu.distributions import Normal

    prior = MultipleIndependent([Normal(0.0, 10.0), Normal(0.0, 10.0)])
    bij = mcmc_transform(prior)

    def ll(u):
        # dim 0: mild periodic structure the hop handles; dim 1: two modes
        # 12 sigma apart the hop cannot touch.
        a = -0.5 * ((u[1] + 3.0) / 0.5) ** 2 + jnp.log(0.5)
        b = -0.5 * ((u[1] - 3.0) / 0.5) ** 2 + jnp.log(0.5)
        return -0.5 * (u[0] / 1.0) ** 2 + jnp.logaddexp(a, b)

    hop = make_grid_hop(bij, index=0, delta=1.0)
    M, S = 6, 300
    init = jnp.concatenate(
        [jnp.zeros((M, 1)), jnp.full((M, 1), -3.0)], axis=1
    )

    s_hop, _ = run_nuts(
        jax.random.key(10), lambda u: ll(u), init,
        num_warmup=250, num_samples=S, max_depth=6, mode_hop=hop,
    )
    frac_hop = float((np.asarray(s_hop)[..., 1] > 0).mean())
    assert frac_hop < 0.02, f"NUTS+hop unexpectedly crossed: {frac_hop}"

    R = 6
    betas = jnp.tile(jnp.asarray(geometric_ladder(R, 0.01), jnp.float32), M)
    init_pt = jnp.tile(init, (1, 1)).repeat(R, axis=0)
    ex = ReplicaExchange(
        n_replicas=R, betas=betas, ll_fn=lambda u, b: ll(u), swap_every=1
    )
    s_pt, info = run_nuts(
        jax.random.key(10), lambda u, beta: beta * ll(u), init_pt,
        num_warmup=250, num_samples=S, max_depth=6, data=betas, exchange=ex,
        mode_hop=hop,
    )
    cold = np.asarray(s_pt).reshape(M, R, S, 2)[:, 0]
    frac_pt = float((cold[..., 1] > 0).mean())
    assert abs(frac_pt - 0.5) < 0.17, f"PT+hop mode weight off: {frac_pt}"
    assert info["swap_accept"] > 0.1


def test_pt_preserves_unimodal_target():
    """Replica exchange is exact MCMC: on a plain correlated Gaussian the
    cold rung must reproduce the target moments (swaps change nothing
    statistically, only mixing)."""
    cov = jnp.array([[2.0, 0.9], [0.9, 1.0]])
    mu = jnp.array([1.0, -2.0])
    prec = jnp.linalg.inv(cov)

    def ll(u):
        d = u - mu
        return -0.5 * d @ prec @ d

    R, M, S = 3, 4, 600
    betas = jnp.tile(jnp.asarray(geometric_ladder(R, 0.2), jnp.float32), M)
    ex = ReplicaExchange(
        n_replicas=R, betas=betas, ll_fn=lambda u, b: ll(u), swap_every=2,
    )
    init = jax.random.normal(jax.random.key(1), (M * R, 2))
    s, info = run_nuts(
        jax.random.key(2), lambda u, beta: beta * ll(u), init,
        num_warmup=400, num_samples=S, data=betas, exchange=ex,
    )
    cold = np.asarray(s).reshape(M, R, S, 2)[:, 0].reshape(-1, 2)
    np.testing.assert_allclose(cold.mean(0), np.asarray(mu), atol=0.15)
    np.testing.assert_allclose(np.cov(cold.T), np.asarray(cov), atol=0.35)
    assert 0.0 < info["swap_accept"] <= 1.0


def test_exchange_validation_errors():
    betas = jnp.ones((6,), jnp.float32)
    ex = ReplicaExchange(n_replicas=4, betas=betas, ll_fn=lambda u, b: 0.0)
    with pytest.raises(ValueError, match="not divisible"):
        run_nuts(
            jax.random.key(0), lambda u, b: -jnp.sum(u**2), jnp.zeros((6, 1)),
            num_warmup=10, num_samples=5, data=betas, exchange=ex,
        )
    ex2 = ReplicaExchange(
        n_replicas=2, betas=jnp.ones((4,), jnp.float32), ll_fn=lambda u, b: 0.0
    )
    with pytest.raises(ValueError, match="betas"):
        run_nuts(
            jax.random.key(0), lambda u, b: -jnp.sum(u**2), jnp.zeros((6, 1)),
            num_warmup=10, num_samples=5, data=jnp.ones((6,)), exchange=ex2,
        )


class _SplitPotential:
    """Minimal potential exposing the (prior, likelihood) split that
    MCMCPosterior._split_logp tempers: a bimodal likelihood in theta-space
    over a Beta prior, mimicking the pulse-DDM t_nd aliasing geometry."""

    def __init__(self, prior):
        self.prior = prior
        self.temperature = 1.0
        self.x_o = jnp.zeros((1,))

        class _Est:
            params = {}

        class _Lik:
            estimator = _Est()

            @staticmethod
            def log_lik_fn(params, x, theta):
                th = theta[:, 0]
                lp1 = jnp.log(0.4) - 0.5 * ((th - 0.25) / 0.01) ** 2
                lp2 = jnp.log(0.6) - 0.5 * ((th - 0.65) / 0.01) ** 2
                return jnp.logaddexp(lp1, lp2)

        self.likelihood = _Lik()

    def potential_fn(self, theta):
        return (
            self.prior.log_prob(theta)
            + self.likelihood.log_lik_fn(None, self.x_o, theta.reshape(1, -1))[0]
        )

    def set_x_o(self, x):
        pass


def test_mcmc_posterior_pt_path():
    """End-to-end MCMCPosterior with pt_replicas > 1: only cold-rung samples
    returned, support respected, both far-apart modes visited with roughly
    correct weights (plain NUTS from prior starts leaves weights to chain
    initialization luck; the assertion tolerance reflects 4 cold chains)."""
    prior = MultipleIndependent([Beta(2.0, 2.0)])
    pot = _SplitPotential(prior)
    post = MCMCPosterior(
        potential_fn=pot,
        proposal=prior,
        theta_transform=mcmc_transform(prior),
        method="nuts",
        num_chains=4,
        warmup_steps=250,
        verbose=False,
        pt_replicas=5,
        pt_beta_min=0.005,
    )
    samples = post.sample((800,), key=jax.random.key(3))
    s = np.asarray(samples)
    assert s.shape == (800, 1)
    assert (s > 0).all() and (s < 1).all()
    in_m1 = float((np.abs(s[:, 0] - 0.25) < 0.05).mean())
    in_m2 = float((np.abs(s[:, 0] - 0.65) < 0.05).mean())
    assert in_m1 + in_m2 > 0.95  # mass concentrated on the two modes
    assert abs(in_m2 - 0.6) < 0.2, f"cold-rung mode weights off: {in_m2}"
    assert post.last_info["swap_accept"] > 0.05


def test_mcmc_posterior_pt_validation():
    prior = MultipleIndependent([Beta(2.0, 2.0)])
    with pytest.raises(ValueError, match="pt_replicas"):
        MCMCPosterior(
            potential_fn=_SplitPotential(prior),
            proposal=prior,
            theta_transform=mcmc_transform(prior),
            method="slice",
            pt_replicas=2,
        )


def test_grid_hop_bounds_from_positive_support():
    """VERDICT round-2 item 7: the hop's support guard must come from the
    prior's bijector, not a hardcoded (0, 1). A LogNormal dimension has
    support (0, inf); modes at 0.5 and 1.5 one period apart would be
    unreachable under the old unit-interval guard (1.5 > 1 rejected)."""
    prior = MultipleIndependent([LogNormal(0.0, 1.0)])
    bij = mcmc_transform(prior)
    w2, mu1, mu2, sig = 0.6, 0.5, 1.5, 0.004

    def logp_u(u):
        th = bij.forward(u)[..., 0]
        lp1 = jnp.log(1 - w2) - 0.5 * ((th - mu1) / sig) ** 2
        lp2 = jnp.log(w2) - 0.5 * ((th - mu2) / sig) ** 2
        return jnp.logaddexp(lp1, lp2) + bij.forward_log_det(u)

    init = bij.inverse(jnp.full((4, 1), mu1))
    hop = make_grid_hop(bij, index=0, delta=1.0)
    s, _ = run_nuts(
        jax.random.key(60), logp_u, init, num_warmup=200, num_samples=400,
        max_depth=6, mode_hop=hop,
    )
    th = np.asarray(bij.forward(s))[..., 0].ravel()
    assert (th > 0).all()
    frac = float((th > 1.0).mean())
    assert abs(frac - w2) < 0.12, f"hop blocked by wrong support guard: {frac}"


def test_grid_hop_explicit_bounds_override():
    prior = MultipleIndependent([Beta(2.0, 2.0)])
    bij = mcmc_transform(prior)
    # Restrict hops to (0, 0.5): a mode at 0.6 must then be unreachable.
    hop = make_grid_hop(bij, index=0, delta=0.3, bounds=(0.0, 0.5))

    def logp_u(u):
        th = bij.forward(u)[..., 0]
        lp1 = -0.5 * ((th - 0.3) / 0.004) ** 2
        lp2 = -0.5 * ((th - 0.6) / 0.004) ** 2
        return jnp.logaddexp(lp1, lp2) + bij.forward_log_det(u)

    init = bij.inverse(jnp.full((2, 1), 0.3))
    s, _ = run_nuts(
        jax.random.key(61), logp_u, init, num_warmup=150, num_samples=200,
        max_depth=6, mode_hop=hop,
    )
    th = np.asarray(bij.forward(s))[..., 0].ravel()
    assert (th < 0.5).all()
