"""MCMC engines: NUTS and slice on analytic posteriors; MCMCPosterior wiring."""

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
from sbi_for_diffusion_models_tpu.inference.mcmc import MCMCPosterior
from sbi_for_diffusion_models_tpu.inference.nuts import run_nuts
from sbi_for_diffusion_models_tpu.inference.slice import run_slice

COV = jnp.array([[2.0, 0.9], [0.9, 1.0]])
MU = jnp.array([1.0, -2.0])
PREC = jnp.linalg.inv(COV)


def gauss_logp(u):
    d = u - MU
    return -0.5 * d @ PREC @ d


def test_nuts_gaussian_moments():
    init = jax.random.normal(jax.random.key(1), (4, 2))
    samples, info = run_nuts(
        jax.random.key(2), gauss_logp, init, num_warmup=400, num_samples=700
    )
    s = np.asarray(samples).reshape(-1, 2)
    np.testing.assert_allclose(s.mean(0), np.asarray(MU), atol=0.15)
    np.testing.assert_allclose(np.cov(s.T), np.asarray(COV), atol=0.3)
    assert int(info["diverging"].sum()) == 0


def test_nuts_accept_prob_near_target():
    init = jax.random.normal(jax.random.key(3), (2, 2))
    _, info = run_nuts(
        jax.random.key(4), gauss_logp, init, num_warmup=400, num_samples=200,
        target_accept=0.8,
    )
    ap = float(info["accept_prob"].mean())
    assert 0.6 < ap <= 1.0, f"accept prob {ap} far from target"


def test_slice_gaussian_moments():
    init = jax.random.normal(jax.random.key(5), (4, 2))
    samples, _ = run_slice(
        jax.random.key(6), gauss_logp, init, num_warmup=150, num_samples=600
    )
    s = np.asarray(samples).reshape(-1, 2)
    np.testing.assert_allclose(s.mean(0), np.asarray(MU), atol=0.2)
    np.testing.assert_allclose(np.cov(s.T), np.asarray(COV), atol=0.35)


class _GaussPotential:
    """Minimal potential object for MCMCPosterior (prior already folded in)."""

    def potential_fn(self, theta, x=None):
        # A product of constrained marginals: Beta(5,5) x LogNormal(0, 0.5).
        prior = MultipleIndependent([Beta(5.0, 5.0), LogNormal(0.0, 0.5)])
        return prior.log_prob(theta)

    def set_x_o(self, x):
        pass


def test_slice_width_adaptation():
    """Warmup must adapt the bracket to the target scale: a posterior with
    sigma = 0.01 and one with sigma = 10 both mix from the default width."""
    for sigma in (0.01, 10.0):
        logp = lambda u: -0.5 * jnp.sum((u / sigma) ** 2)
        init = 0.1 * sigma * jnp.ones((2, 2))
        samples, info = run_slice(
            jax.random.key(8), logp, init, num_warmup=200, num_samples=500
        )
        s = np.asarray(samples).reshape(-1, 2)
        assert abs(s.std() / sigma - 1.0) < 0.25, f"sigma={sigma}: std={s.std()}"
        # Adapted widths should land within an order of magnitude of 4 sigma.
        w = float(np.median(np.asarray(info["width"])))
        assert 0.4 * sigma < w < 40 * sigma, f"sigma={sigma}: width={w}"
        # accept_prob is a real statistic now (shrinkage success fraction).
        assert 0.0 < float(info["accept_prob"].mean()) <= 1.0


def test_init_strategy_validation_and_resample():
    prior = MultipleIndependent([Beta(5.0, 5.0), LogNormal(0.0, 0.5)])
    with pytest.raises(ValueError, match="init_strategy"):
        MCMCPosterior(
            potential_fn=_GaussPotential(),
            proposal=prior,
            theta_transform=mcmc_transform(prior),
            init_strategy="sir",
        )
    post = MCMCPosterior(
        potential_fn=_GaussPotential(),
        proposal=prior,
        theta_transform=mcmc_transform(prior),
        method="slice",
        num_chains=4,
        warmup_steps=50,
        init_strategy="resample",
        verbose=False,
    )
    samples = post.sample((100,), key=jax.random.key(9))
    assert np.asarray(samples).shape == (100, 2)


def test_nuts_slice_auto_fallback(monkeypatch):
    """A divergence storm must trigger the reference notebooks' NUTS->slice
    fallback recipe (ryans_test.ipynb cell 4)."""
    import sbi_for_diffusion_models_tpu.inference.mcmc as mcmc_mod

    prior = MultipleIndependent([Beta(5.0, 5.0), LogNormal(0.0, 0.5)])

    def fake_run_nuts(key, logp, init_u, *, num_warmup, num_samples, **kw):
        C, D = init_u.shape
        return (
            jnp.zeros((C, num_samples, D)),
            {
                "accept_prob": jnp.full((C, num_samples), 0.1),
                "diverging": jnp.ones((C, num_samples), jnp.int32),
                "num_steps": jnp.ones((C, num_samples), jnp.int32),
            },
        )

    monkeypatch.setattr(mcmc_mod, "run_nuts", fake_run_nuts)
    post = mcmc_mod.MCMCPosterior(
        potential_fn=_GaussPotential(),
        proposal=prior,
        theta_transform=mcmc_transform(prior),
        method="nuts",
        num_chains=4,
        warmup_steps=50,
        verbose=False,
    )
    samples = post.sample((200,), key=jax.random.key(10))
    assert post.used_fallback
    s = np.asarray(samples)
    # Fallback samples come from the real slice sampler over the prior.
    assert (s[:, 0] > 0).all() and (s[:, 0] < 1).all()
    assert abs(s[:, 0].mean() - 0.5) < 0.1


def test_healthy_nuts_does_not_fall_back():
    prior = MultipleIndependent([Beta(5.0, 5.0), LogNormal(0.0, 0.5)])
    post = MCMCPosterior(
        potential_fn=_GaussPotential(),
        proposal=prior,
        theta_transform=mcmc_transform(prior),
        method="nuts",
        num_chains=4,
        warmup_steps=150,
        verbose=False,
    )
    post.sample((200,), key=jax.random.key(11))
    assert not post.used_fallback


def test_nuts_checkpoint_fingerprint_guards_stale_resume(tmp_path, capsys):
    """A checkpoint from a run with the same (chains, D) but different
    key/segment/warmup/sample settings must be ignored, not spliced in."""
    init = jax.random.normal(jax.random.key(20), (2, 2))
    ck = str(tmp_path / "nuts")
    s1, _ = run_nuts(
        jax.random.key(21), gauss_logp, init, num_warmup=50, num_samples=60,
        checkpoint_dir=ck,
    )
    # Identical settings: resume is a pure replay of completed segments.
    s1b, _ = run_nuts(
        jax.random.key(21), gauss_logp, init, num_warmup=50, num_samples=60,
        checkpoint_dir=ck,
    )
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s1b))
    # Different key, same shapes: must NOT reuse the stored segments.
    capsys.readouterr()
    s2, _ = run_nuts(
        jax.random.key(99), gauss_logp, init, num_warmup=50, num_samples=60,
        checkpoint_dir=ck,
    )
    out = capsys.readouterr().out
    assert "stale checkpoint" in out
    assert not np.array_equal(np.asarray(s1), np.asarray(s2))


def test_nuts_mirror_every_invariance():
    """Pipelining depth and mirror cadence are pure host-side scheduling:
    samples must be bit-identical across mirror_every settings."""
    init = jax.random.normal(jax.random.key(30), (2, 2))
    s1, _ = run_nuts(
        jax.random.key(31), gauss_logp, init, num_warmup=40, num_samples=50,
        segment_length=20, mirror_every=1,
    )
    s2, _ = run_nuts(
        jax.random.key(31), gauss_logp, init, num_warmup=40, num_samples=50,
        segment_length=20, mirror_every=5,
    )
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))


def test_nuts_device_loss_rewind_replays_exactly(monkeypatch):
    """Inject a device loss mid-run: the driver must rewind to the last
    mirror, replay, and produce bit-identical samples."""
    import sbi_for_diffusion_models_tpu.inference.nuts as nuts_mod

    init = jax.random.normal(jax.random.key(40), (2, 2))
    kwargs = dict(num_warmup=30, num_samples=60, segment_length=15, mirror_every=2)
    clean, _ = run_nuts(jax.random.key(41), gauss_logp, init, **kwargs)

    real_get = jax.device_get
    calls = {"n": 0}

    def flaky_get(x):
        calls["n"] += 1
        if calls["n"] == 3:
            raise jax.errors.JaxRuntimeError("injected device loss")
        return real_get(x)

    monkeypatch.setattr(nuts_mod.jax, "device_get", flaky_get)
    try:
        faulted, _ = run_nuts(jax.random.key(41), gauss_logp, init, **kwargs)
    finally:
        monkeypatch.setattr(nuts_mod.jax, "device_get", real_get)
    assert calls["n"] >= 3, "fault was never injected"
    np.testing.assert_array_equal(np.asarray(clean), np.asarray(faulted))


@pytest.mark.parametrize("method", ["nuts", "slice"])
def test_mcmc_posterior_respects_support_and_shape(method):
    prior = MultipleIndependent([Beta(5.0, 5.0), LogNormal(0.0, 0.5)])
    post = MCMCPosterior(
        potential_fn=_GaussPotential(),
        proposal=prior,
        theta_transform=mcmc_transform(prior),
        method=method,
        num_chains=4,
        warmup_steps=150,
        verbose=False,
    )
    samples = post.sample((500,), key=jax.random.key(7))
    s = np.asarray(samples)
    assert s.shape == (500, 2)
    assert (s[:, 0] > 0).all() and (s[:, 0] < 1).all()  # Beta support
    assert (s[:, 1] > 0).all()  # LogNormal support
    # Sampling the prior via its own potential should recover prior moments.
    assert abs(s[:, 0].mean() - 0.5) < 0.06
    ref = float(np.exp(0.5 * 0.25))  # LogNormal mean e^{sigma^2/2}
    assert abs(s[:, 1].mean() - ref) < 0.25


def test_grid_hop_mixes_periodic_modes():
    """A narrow two-mode target with modes exactly one grid period apart:
    NUTS alone stays in the starting mode; with make_grid_hop the chain
    recovers the true mode weights (the pulse-DDM t_nd aliasing scenario)."""
    from sbi_for_diffusion_models_tpu.inference.mcmc import make_grid_hop
    from sbi_for_diffusion_models_tpu.inference.nuts import run_nuts

    prior = MultipleIndependent([Beta(2.0, 2.0)])
    bij = mcmc_transform(prior)
    w2, mu1, mu2, sig = 0.7, 0.30, 0.40, 0.004

    def logp_u(u):
        th = bij.forward(u)[..., 0]
        lp1 = jnp.log(1 - w2) - 0.5 * ((th - mu1) / sig) ** 2
        lp2 = jnp.log(w2) - 0.5 * ((th - mu2) / sig) ** 2
        return jnp.logaddexp(lp1, lp2) + bij.forward_log_det(u)

    init = bij.inverse(jnp.full((4, 1), mu1))  # all chains in the SMALL mode

    s0, _ = run_nuts(jax.random.key(50), logp_u, init,
                     num_warmup=200, num_samples=400, max_depth=6)
    th0 = np.asarray(bij.forward(s0))[..., 0].ravel()
    frac0 = float((th0 > 0.35).mean())
    assert frac0 < 0.05, f"NUTS unexpectedly crossed on its own: {frac0}"

    hop = make_grid_hop(bij, index=0, delta=0.1)
    s1, _ = run_nuts(jax.random.key(50), logp_u, init,
                     num_warmup=200, num_samples=400, max_depth=6,
                     mode_hop=hop)
    th1 = np.asarray(bij.forward(s1))[..., 0].ravel()
    frac1 = float((th1 > 0.35).mean())
    assert abs(frac1 - w2) < 0.12, f"hop did not recover mode weights: {frac1}"
    # out-of-support proposals were rejected, support respected
    assert (th1 > 0).all() and (th1 < 1).all()


def test_grid_hop_in_slice():
    from sbi_for_diffusion_models_tpu.inference.mcmc import make_grid_hop
    from sbi_for_diffusion_models_tpu.inference.slice import run_slice

    prior = MultipleIndependent([Beta(2.0, 2.0)])
    bij = mcmc_transform(prior)
    w2, mu1, mu2, sig = 0.6, 0.25, 0.35, 0.004

    def logp_u(u):
        th = bij.forward(u)[..., 0]
        lp1 = jnp.log(1 - w2) - 0.5 * ((th - mu1) / sig) ** 2
        lp2 = jnp.log(w2) - 0.5 * ((th - mu2) / sig) ** 2
        return jnp.logaddexp(lp1, lp2) + bij.forward_log_det(u)

    init = bij.inverse(jnp.full((4, 1), mu1))
    hop = make_grid_hop(bij, index=0, delta=0.1)
    s, _ = run_slice(jax.random.key(51), logp_u, init,
                     num_warmup=150, num_samples=400, mode_hop=hop)
    th = np.asarray(bij.forward(s))[..., 0].ravel()
    frac = float((th > 0.30).mean())
    assert abs(frac - w2) < 0.15, f"slice+hop mode weights off: {frac}"


def test_dim_slice_invariance_hard_wall():
    """Exact-invariance check for make_dim_slice: starting from EXACT
    samples of a hard-wall target (u1 ~ N(0,1) truncated at 0.7 — the
    shifted-log onset-wall geometry), applying the move repeatedly must
    leave the distribution unchanged (KS vs the analytic truncated CDF)."""
    from scipy import stats

    from sbi_for_diffusion_models_tpu.inference.mcmc import make_dim_slice

    wall = 0.7

    def logp(u):
        lp = -0.5 * jnp.sum(u**2)
        return jnp.where(u[1] < wall, lp, -jnp.inf)

    vg = jax.value_and_grad(logp)
    move = make_dim_slice(1, width=1.0)

    n = 2000
    rng = np.random.default_rng(0)
    u0 = rng.normal(size=(n,))
    u1 = stats.truncnorm.rvs(-np.inf, wall, size=n, random_state=1)
    u = jnp.asarray(np.stack([u0, u1], -1), jnp.float32)

    @jax.jit
    @jax.vmap
    def apply3(key, u):
        lp, g = vg(u)
        for i in range(3):
            u, lp, g = move(jax.random.fold_in(key, i), u, lp, g, vg)
        return u

    out = np.asarray(apply3(jax.random.split(jax.random.key(2), n), u))
    assert np.all(out[:, 1] < wall)
    p = stats.kstest(out[:, 1], lambda x: stats.truncnorm.cdf(x, -np.inf, wall)).pvalue
    assert p > 0.01, f"dim_slice broke invariance on the wall target: KS p={p}"
    # the move must actually move (it is not an identity kernel)
    assert np.mean(np.abs(out[:, 1] - np.asarray(u)[:, 1]) > 1e-6) > 0.9


def test_dim_slice_invariance_cap_binding():
    """Exact-invariance check in the CAP-BINDING regime (round-3 VERDICT
    weak #3): width 0.3 / max_stepout 2 on an Exp(1) coordinate (hard wall
    at 0, heavy right side) binds the expansion budget on essentially every
    call AND the target is asymmetric, which is where a non-reversible
    expansion shows. Neal's randomized per-side budget split (J ~ U{0..m-1},
    K = m-1-J) keeps the kernel reversible here; the old deterministic
    both-sides-to-cap expansion fails this exact test at KS p ~ 9e-9
    (measured) because its interval position relative to the current point
    is not exchangeable between x0 and the accepted x1 when the cap binds."""
    from scipy import stats

    from sbi_for_diffusion_models_tpu.inference.mcmc import make_dim_slice

    def logp(u):
        lp = -0.5 * u[0] ** 2 - u[1]
        return jnp.where(u[1] > 0, lp, -jnp.inf)

    vg = jax.value_and_grad(logp)
    move = make_dim_slice(1, width=0.3, max_stepout=2)

    n = 8000
    rng = np.random.default_rng(3)
    u = jnp.asarray(
        np.stack([rng.normal(size=n), rng.exponential(size=n)], -1),
        jnp.float32,
    )

    @jax.jit
    @jax.vmap
    def apply8(key, u):
        lp, g = vg(u)
        for i in range(8):
            u, lp, g = move(jax.random.fold_in(key, i), u, lp, g, vg)
        return u

    out = np.asarray(apply8(jax.random.split(jax.random.key(4), n), u))
    p = stats.kstest(out[:, 1], "expon").pvalue
    assert p > 0.01, f"dim_slice not invariant when the cap binds: KS p={p}"
    # the move must actually move despite the narrow width
    assert np.mean(np.abs(out[:, 1] - np.asarray(u)[:, 1]) > 1e-6) > 0.9


def test_dim_slice_in_nuts_hard_wall():
    """NUTS + make_dim_slice on a wall target recovers the truncated
    marginal from a far-off start (leapfrog alone refuses moves into the
    wall; the slice interval shrinks off it)."""
    from scipy import stats

    from sbi_for_diffusion_models_tpu.inference.mcmc import make_dim_slice
    from sbi_for_diffusion_models_tpu.inference.nuts import run_nuts

    wall = 0.5

    def logp(u):
        lp = -0.5 * jnp.sum(u**2, axis=-1)
        return jnp.where(u[..., 1] < wall, lp, -jnp.inf)

    init = jnp.tile(jnp.array([[0.0, -3.0]], jnp.float32), (4, 1))
    s, _ = run_nuts(jax.random.key(7), logp, init, num_warmup=200,
                    num_samples=300, max_depth=6,
                    mode_hop=make_dim_slice(1, width=1.0))
    u1 = np.asarray(s)[..., 1].ravel()
    assert np.all(u1 < wall)
    m_true = stats.truncnorm.mean(-np.inf, wall)
    assert abs(u1.mean() - m_true) < 0.12, (u1.mean(), m_true)


def test_compose_moves_hop_plus_slice():
    """compose_moves(grid_hop, dim_slice) still recovers two-mode weights
    (each component preserves the target; the composition must too)."""
    from sbi_for_diffusion_models_tpu.inference.mcmc import (
        compose_moves,
        make_dim_slice,
        make_grid_hop,
    )
    from sbi_for_diffusion_models_tpu.inference.nuts import run_nuts

    prior = MultipleIndependent([Beta(2.0, 2.0)])
    bij = mcmc_transform(prior)
    w2, mu1, mu2, sig = 0.7, 0.30, 0.40, 0.004

    def logp_u(u):
        th = bij.forward(u)[..., 0]
        lp1 = jnp.log(1 - w2) - 0.5 * ((th - mu1) / sig) ** 2
        lp2 = jnp.log(w2) - 0.5 * ((th - mu2) / sig) ** 2
        return jnp.logaddexp(lp1, lp2) + bij.forward_log_det(u)

    init = bij.inverse(jnp.full((4, 1), mu1))
    move = compose_moves(make_grid_hop(bij, index=0, delta=0.1),
                         make_dim_slice(0, width=0.5))
    s, _ = run_nuts(jax.random.key(50), logp_u, init, num_warmup=200,
                    num_samples=400, max_depth=6, mode_hop=move)
    th = np.asarray(bij.forward(s))[..., 0].ravel()
    frac = float((th > 0.35).mean())
    assert abs(frac - w2) < 0.12, f"composed move mode weights off: {frac}"
    assert (th > 0).all() and (th < 1).all()
    # compose_moves degenerate forms
    assert compose_moves(None) is None
    one = make_dim_slice(0)
    assert compose_moves(None, one) is one
