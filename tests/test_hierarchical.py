"""Hierarchical multi-subject model: packing, prior math, joint inference."""

import jax
import jax.numpy as jnp
import numpy as np

from sbi_for_diffusion_models_tpu.models.hierarchical import (
    HierarchicalModel,
    run_hierarchical_inference,
    simulate_hierarchical_sessions,
)
from sbi_for_diffusion_models_tpu.models.rt_choice_model import pack_x_rt_choice
from sbi_for_diffusion_models_tpu.nets.mnle_net import MNLEConfig, build_mnle
from sbi_for_diffusion_models_tpu.pipeline import build_prior_theta


def test_pack_unpack_roundtrip():
    prior = build_prior_theta()
    model = HierarchicalModel.from_prior(prior)
    S = 4
    q = jnp.arange(model.dim(S), dtype=jnp.float32)
    mu, log_tau, eps = model.unpack(q, S)
    assert mu.shape == (5,) and log_tau.shape == (5,) and eps.shape == (S, 5)
    np.testing.assert_array_equal(np.asarray(mu), np.arange(5))
    u = model.subject_u(q, S)
    np.testing.assert_allclose(
        np.asarray(u), np.asarray(mu + jnp.exp(log_tau) * eps), rtol=1e-6
    )


def test_log_prior_is_gaussian_sum():
    prior = build_prior_theta()
    model = HierarchicalModel.from_prior(prior)
    S = 2
    q = jnp.zeros(model.dim(S))
    lp = float(model.log_prior(q, S))
    # Against scipy at the zero point.
    from scipy.stats import norm

    want = (
        norm.logpdf(0.0, np.asarray(model.mu_loc), np.asarray(model.mu_scale)).sum()
        + norm.logpdf(
            0.0, np.asarray(model.log_tau_loc), np.asarray(model.log_tau_scale)
        ).sum()
        + norm.logpdf(np.zeros(S * 5)).sum()
    )
    np.testing.assert_allclose(lp, want, rtol=1e-5)


def test_simulate_and_infer_tiny():
    prior = build_prior_theta()
    theta_true, x, pulses = simulate_hierarchical_sessions(
        prior, num_subjects=2, trials_per_subject=4, seed=1
    )
    assert theta_true.shape == (2, 5)
    assert x.shape == (2, 4, 2) and pulses.shape[:2] == (2, 4)
    xp = jax.vmap(lambda xi: pack_x_rt_choice(xi, log_rt=False))(x)
    est = build_mnle(
        jax.random.key(0),
        MNLEConfig(condition_dim=85, hidden_features=16, num_transforms=2, num_bins=5),
    )
    out = run_hierarchical_inference(
        est, prior, xp, pulses,
        num_chains=2, num_warmup=15, num_samples=10, max_tree_depth=5,
        verbose=False,
    )
    assert out["theta_subjects"].shape == (20, 2, 5)
    assert out["population_theta"].shape == (20, 5)
    s = out["theta_subjects"].reshape(-1, 5)
    assert (s[:, 0] > 0).all() and (s[:, 0] < 1).all()  # a0 in (0,1)
    assert (s[:, 1:4] > 0).all()  # positive supports
    assert np.isfinite(out["raw"]).all()


def test_hierarchical_inference_with_ensemble():
    """MNLEEnsemble duck-types dispatch_log_prob through the hierarchical
    potential (round-3 VERDICT #4: thread the ensemble through
    run_hierarchical_inference), so the mixture likelihood drives joint
    NUTS unchanged."""
    from sbi_for_diffusion_models_tpu.mnle import MNLEEnsemble

    prior = build_prior_theta()
    _, x, pulses = simulate_hierarchical_sessions(
        prior, num_subjects=2, trials_per_subject=4, seed=3
    )
    xp = jax.vmap(lambda xi: pack_x_rt_choice(xi, log_rt=False))(x)
    cfg = MNLEConfig(
        condition_dim=85, hidden_features=16, num_transforms=2, num_bins=5
    )
    ens = MNLEEnsemble(
        [build_mnle(jax.random.key(k), cfg) for k in range(2)]
    )
    out = run_hierarchical_inference(
        ens, prior, xp, pulses,
        num_chains=2, num_warmup=15, num_samples=10, max_tree_depth=5,
        verbose=False,
    )
    assert out["theta_subjects"].shape == (20, 2, 5)
    assert np.isfinite(out["raw"]).all()


def test_simulate_returns_hyperparams():
    """return_hyperparams exposes the generating (mu, log_tau) for coverage
    checks (benchmarks/hierarchical_coverage.py); hyper_shrink=1.0 samples
    the exact hyperprior. Subjects must be reproducible from the returned
    hyperparameters' seed stream."""
    prior = build_prior_theta()
    model = HierarchicalModel.from_prior(prior)
    theta, x, pulses, (mu, log_tau) = simulate_hierarchical_sessions(
        prior, num_subjects=3, trials_per_subject=2, model=model, seed=7,
        return_hyperparams=True, hyper_shrink=1.0,
    )
    assert mu.shape == (5,) and log_tau.shape == (5,)
    assert np.isfinite(np.asarray(mu)).all()
    assert np.isfinite(np.asarray(log_tau)).all()
    # Default call is unchanged (3-tuple, shrunk hyperprior).
    out = simulate_hierarchical_sessions(
        prior, num_subjects=3, trials_per_subject=2, seed=7
    )
    assert len(out) == 3


def test_hyperprior_moment_matches_subject_prior():
    """from_prior must center the hyperprior on the single-subject prior's
    UNCONSTRAINED moments — not at zero. With the old zero-centered default,
    the B dim (prior LogNormal(2.75, 0.5), unconstrained mean 2.75) drew
    subjects at B ~ 1 where the MNLE surrogate was never trained; measured
    effect: hyperparameter coverage ~0.4 at nominal 0.9."""
    import jax.numpy as jnp

    from sbi_for_diffusion_models_tpu.distributions import mcmc_transform

    prior = build_prior_theta()
    model = HierarchicalModel.from_prior(prior)
    bij = mcmc_transform(prior)
    u = bij.inverse(jnp.asarray(prior.sample(jax.random.key(99), (8192,))))
    mean_u = np.asarray(u.mean(0))
    std_u = np.asarray(u.std(0))
    np.testing.assert_allclose(np.asarray(model.mu_loc), mean_u, atol=0.1)
    # B dim specifically: centered near 2.75, nowhere near 0.
    assert abs(float(model.mu_loc[3]) - 2.75) < 0.1
    # Hyperprior spread is a fraction of the prior spread per dim.
    np.testing.assert_allclose(
        np.asarray(model.mu_scale) / std_u, 0.75, rtol=0.05
    )
    # Implied marginal subject std (mu_frac^2 + tau_frac^2 E[e^{2Z}]) stays
    # within the trained prior spread.
    tau2 = np.exp(2 * np.asarray(model.log_tau_loc) + 2 * 0.4**2)
    marginal = np.sqrt(np.asarray(model.mu_scale) ** 2 + tau2)
    assert (marginal < 1.05 * std_u).all()


def test_hierarchical_inference_with_parallel_tempering():
    """pt_replicas > 1 runs replica-exchange over the joint posterior
    (the hierarchy inherits the subject-level t_nd multimodality) and
    returns only cold-rung draws, same output contract as plain NUTS."""
    prior = build_prior_theta()
    theta_true, x, pulses = simulate_hierarchical_sessions(
        prior, num_subjects=2, trials_per_subject=4, seed=3
    )
    xp = jax.vmap(lambda xi: pack_x_rt_choice(xi, log_rt=False))(x)
    est = build_mnle(
        jax.random.key(0),
        MNLEConfig(condition_dim=85, hidden_features=16, num_transforms=2, num_bins=5),
    )
    out = run_hierarchical_inference(
        est, prior, xp, pulses,
        num_chains=2, num_warmup=15, num_samples=10, max_tree_depth=4,
        pt_replicas=2, pt_beta_min=0.3, verbose=False,
    )
    assert out["raw"].shape == (2, 10, 2 * 5 + 2 * 5)  # cold rung only
    assert out["theta_subjects"].shape == (20, 2, 5)
    assert np.isfinite(out["raw"]).all()
    assert out["swap_accept"] is not None


def test_hierarchical_inference_batched_datasets():
    """x with a leading dataset axis (B, S, T, 2) folds all B inferences
    into one vmapped NUTS launch; every output gains the B axis. Covers
    both the PT and the plain batched row layouts."""
    prior = build_prior_theta()
    sims = [
        simulate_hierarchical_sessions(
            prior, num_subjects=2, trials_per_subject=4, seed=10 + b
        )
        for b in range(3)
    ]
    xs = np.stack([s[1] for s in sims])  # (3, 2, 4, 2)
    pss = np.stack([s[2] for s in sims])
    est = build_mnle(
        jax.random.key(0),
        MNLEConfig(condition_dim=85, hidden_features=16, num_transforms=2, num_bins=5),
    )
    dim = 2 * 5 + 2 * 5
    out = run_hierarchical_inference(
        est, prior, xs, pss,
        num_chains=2, num_warmup=15, num_samples=10, max_tree_depth=4,
        pt_replicas=2, pt_beta_min=0.3, verbose=False,
    )
    assert out["raw"].shape == (3, 2, 10, dim)
    assert out["theta_subjects"].shape == (3, 20, 2, 5)
    assert out["population_theta"].shape == (3, 20, 5)
    assert np.isfinite(out["raw"]).all()
    assert out["swap_accept"] is not None
    # Plain batched (R=1) layout.
    out1 = run_hierarchical_inference(
        est, prior, xs, pss,
        num_chains=2, num_warmup=10, num_samples=5, max_tree_depth=4,
        verbose=False,
    )
    assert out1["raw"].shape == (3, 2, 5, dim)
    assert out1["swap_accept"] is None
    assert np.isfinite(out1["raw"]).all()
    # Different datasets must produce different posteriors (the per-row
    # data gather is actually conditioning on the right rep).
    m = out1["raw"].mean(axis=(1, 2))  # (3, dim)
    assert not np.allclose(m[0], m[1])
