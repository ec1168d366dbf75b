"""SBC: batched path == serial semantics, rank statistic, diagnostics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sbi_for_diffusion_models_tpu.inference.diagnostics import (
    effective_sample_size,
    split_r_hat,
)
from sbi_for_diffusion_models_tpu.mnle import _compute_ranks, run_sbc
from sbi_for_diffusion_models_tpu.nets.mnle_net import MNLEConfig, build_mnle
from sbi_for_diffusion_models_tpu.pipeline import build_prior_theta
from sbi_for_diffusion_models_tpu.run_config import RUN_CONFIG_PARAMS


def test_compute_ranks():
    samples = np.array([[0.1, 5.0], [0.2, 4.0], [0.3, 3.0]])
    theta = np.array([0.25, 10.0])
    np.testing.assert_array_equal(_compute_ranks(samples, theta), [2, 3])


def test_diagnostics_iid_chains():
    ch = np.random.default_rng(0).normal(size=(4, 400, 2))
    assert (split_r_hat(ch) < 1.02).all()
    assert (effective_sample_size(ch) > 600).all()


def test_diagnostics_flag_stuck_chain():
    rng = np.random.default_rng(1)
    ch = rng.normal(size=(2, 300, 1))
    ch[1] += 10.0  # disjoint chains -> r_hat >> 1
    assert split_r_hat(ch)[0] > 2.0


@pytest.fixture(scope="module")
def tiny_setup():
    prior = build_prior_theta()
    est = build_mnle(
        jax.random.key(0),
        MNLEConfig(condition_dim=85, hidden_features=16, num_transforms=2, num_bins=5),
    )
    cfg = RUN_CONFIG_PARAMS.replace(
        NUM_TRIALS_OBS=5, NUM_CHAINS=2, WARMUP_STEPS=25,
        SBC_NUM_DATASETS=2, SBC_POST_SAMPLES=20, MCMC_MAX_TREE_DEPTH=6,
        # The untrained tiny estimator leaves chains unmixed, which would
        # trip the default mixing gate and re-run every dataset; the gate
        # has its own dedicated tests below.
        SBC_REMEDIATE=False,
    )
    return prior, est, cfg


def test_run_sbc_batched_shapes_and_files(tiny_setup, tmp_path):
    prior, est, cfg = tiny_setup
    out = run_sbc(cfg, prior, est, outdir=tmp_path, seed=0, verbose=False)
    assert out["ranks"].shape == (2, 5)
    assert out["thetas_true"].shape == (2, 5)
    assert (out["ranks"] >= 0).all() and (out["ranks"] <= 20).all()
    assert len(out["all_samples"]) == 2
    assert out["all_samples"][0].shape == (20, 5)
    for f in ("sbc_thetas_true.npy", "sbc_ranks.npy", "sbc_rank_histograms.png"):
        assert (tmp_path / f).exists(), f
    # Posterior samples respect the prior supports.
    s = out["all_samples"][0]
    assert (s[:, 0] > 0).all() and (s[:, 0] < 1).all()
    assert (s[:, 1:4] > 0).all()
    # Per-dataset divergence counts (NUTS path): finite and non-negative.
    div = np.asarray(out["divergences_per_dataset"])
    assert div.shape == (2,)
    assert np.isfinite(div).all() and (div >= 0).all()
    assert "divergences" in np.load(tmp_path / "sbc_mixing_diagnostics.npz")
    # Incremental partials: every completed group leaves a readable
    # rank/mixing snapshot so capped or crashed long runs aren't opaque.
    import json

    partial = json.loads((tmp_path / "partial_summary.json").read_text())
    assert partial["datasets_done"] == partial["datasets_total"] == 2
    assert len(partial["rhat_max_per_dataset"]) == 2
    part_ranks = np.load(tmp_path / "sbc_ranks.partial.npy")
    np.testing.assert_array_equal(part_ranks, out["ranks"])


def test_run_sbc_serial_matches_interface(tiny_setup, tmp_path):
    prior, est, cfg = tiny_setup
    cfg = cfg.replace(SBC_NUM_DATASETS=1, SBC_POST_SAMPLES=10, WARMUP_STEPS=15)
    out = run_sbc(cfg, prior, est, outdir=tmp_path, seed=0, verbose=False, batched=False)
    assert out["ranks"].shape == (1, 5)


def test_run_sbc_batched_with_slice(tiny_setup, tmp_path):
    prior, est, cfg = tiny_setup
    cfg = cfg.replace(
        MCMC_METHOD="slice", SBC_NUM_DATASETS=1, SBC_POST_SAMPLES=10,
        WARMUP_STEPS=10,
    )
    out = run_sbc(cfg, prior, est, outdir=tmp_path, seed=0, verbose=False)
    assert out["ranks"].shape == (1, 5)
    s = out["all_samples"][0]
    assert (s[:, 0] > 0).all() and (s[:, 0] < 1).all()


def test_run_sbc_batched_on_mesh(tiny_setup, tmp_path):
    """Chain axis sharded over the 8-device CPU mesh."""
    from sbi_for_diffusion_models_tpu.parallel.mesh import default_mesh

    prior, est, cfg = tiny_setup
    cfg = cfg.replace(SBC_NUM_DATASETS=2, SBC_POST_SAMPLES=16, WARMUP_STEPS=15)
    mesh = default_mesh(axis_name="chains")
    out = run_sbc(
        cfg, prior, est, outdir=tmp_path, seed=0, verbose=False,
        group_size=2, mesh=mesh,  # 2 datasets x 2 chains x ... folds to 4? pad
    )
    assert out["ranks"].shape == (2, 5)
    assert np.isfinite(out["all_samples"][0]).all()


def test_run_sbc_batched_with_pulse_rep(tmp_path):
    """End-to-end SBC with the pulse-grid RT representation: the potential,
    NUTS gradients (through the barrier and logit phase), and rank stats must
    all compose."""
    prior = build_prior_theta()
    est = build_mnle(
        jax.random.key(5),
        MNLEConfig(
            condition_dim=85, hidden_features=16, num_transforms=2, num_bins=5,
            rt_rep="pulse", censor_rt=True,
        ),
    )
    cfg = RUN_CONFIG_PARAMS.replace(
        NUM_TRIALS_OBS=5, NUM_CHAINS=2, WARMUP_STEPS=25,
        SBC_NUM_DATASETS=2, SBC_POST_SAMPLES=20, MCMC_MAX_TREE_DEPTH=6,
        MNLE_RT_REP="pulse", MNLE_CENSOR_RT=True,
    )
    out = run_sbc(cfg, prior, est, outdir=tmp_path, seed=0, verbose=False)
    assert out["ranks"].shape == (2, 5)
    s = out["all_samples"][0]
    assert np.isfinite(s).all()
    assert (s[:, 0] > 0).all() and (s[:, 0] < 1).all()
    assert (s[:, 4] > 0).all() and (s[:, 4] < 1).all()


def test_run_sbc_batched_with_parallel_tempering(tiny_setup, tmp_path):
    """SBC with MCMC_PT_REPLICAS > 1: only cold-rung samples pooled into
    ranks, replica groups survive mesh-free padding, and the per-dataset
    mixing diagnostics (VERDICT round-2 item 2) land in the output and on
    disk."""
    prior, est, cfg = tiny_setup
    cfg = cfg.replace(
        SBC_NUM_DATASETS=2, SBC_POST_SAMPLES=20, WARMUP_STEPS=20,
        MCMC_PT_REPLICAS=2, MCMC_PT_BETA_MIN=0.3,
    )
    out = run_sbc(cfg, prior, est, outdir=tmp_path, seed=0, verbose=False)
    assert out["ranks"].shape == (2, 5)
    assert (out["ranks"] >= 0).all() and (out["ranks"] <= 20).all()
    s = out["all_samples"][0]
    assert s.shape == (20, 5)
    assert (s[:, 0] > 0).all() and (s[:, 0] < 1).all()
    # per-dataset mixing diagnostics recorded
    assert out["rhat_max"].shape == (2,)
    assert out["min_ess"].shape == (2,)
    assert np.isfinite(out["rhat_max"]).all()
    assert out["swap_accept"] is not None
    assert all(0.0 <= a <= 1.0 for a in out["swap_accept"])
    blob = np.load(tmp_path / "sbc_mixing_diagnostics.npz")
    np.testing.assert_array_equal(blob["rhat_max"], out["rhat_max"])
    np.testing.assert_array_equal(blob["min_ess"], out["min_ess"])


def test_run_sbc_pt_on_mesh(tiny_setup, tmp_path):
    """PT + mesh sharding: padding must append whole replica groups (rows
    only couple within a group through the DEO swap)."""
    from sbi_for_diffusion_models_tpu.parallel.mesh import default_mesh

    prior, est, cfg = tiny_setup
    cfg = cfg.replace(
        SBC_NUM_DATASETS=2, SBC_POST_SAMPLES=12, WARMUP_STEPS=15,
        MCMC_PT_REPLICAS=3, MCMC_PT_BETA_MIN=0.3,
    )
    mesh = default_mesh(axis_name="chains")
    out = run_sbc(
        cfg, prior, est, outdir=tmp_path, seed=0, verbose=False,
        group_size=2, mesh=mesh,
    )
    assert out["ranks"].shape == (2, 5)
    assert np.isfinite(out["all_samples"][0]).all()


def test_run_sbc_pt_rejects_slice(tiny_setup, tmp_path):
    prior, est, cfg = tiny_setup
    cfg = cfg.replace(MCMC_METHOD="slice", MCMC_PT_REPLICAS=2)
    with pytest.raises(ValueError, match="PT_REPLICAS"):
        run_sbc(cfg, prior, est, outdir=tmp_path, seed=0, verbose=False)


def test_sbc_mixing_gate_remediation(tiny_setup, tmp_path):
    """Mixing gate (round-3 VERDICT #2): with an impossible gate every
    dataset is flagged, the remediation pass re-runs them with doubled
    warmup, substitutes the draws, and records before/after diagnostics;
    flagged_final lands in the npz."""
    prior, est, cfg = tiny_setup
    cfg = cfg.replace(
        SBC_NUM_DATASETS=2, SBC_POST_SAMPLES=20, WARMUP_STEPS=15,
        SBC_RHAT_GATE=-1.0,  # flag everything
        SBC_REMEDIATE=True, SBC_REMEDIATE_ROUNDS=1,
    )
    out = run_sbc(cfg, prior, est, outdir=tmp_path, seed=0, verbose=False)
    rem = out["remediation"]
    assert rem is not None
    assert rem["flagged"] == [0, 1]
    assert rem["remediated"] == [0, 1]
    assert rem["warmup"] == 30
    assert len(rem["rhat_before"]) == len(rem["rhat_after"]) == 2
    # gate is impossible, so everything stays flagged after the re-run
    assert rem["still_flagged"] == [0, 1]
    assert len(rem["rounds"]) == 1
    assert out["flagged_final"] == [0, 1]
    # remediated draws replaced the originals and are valid posterior draws
    assert out["ranks"].shape == (2, 5)
    s = out["all_samples"][0]
    assert s.shape == (20, 5)
    assert (s[:, 0] > 0).all() and (s[:, 0] < 1).all()
    blob = np.load(tmp_path / "sbc_mixing_diagnostics.npz")
    np.testing.assert_array_equal(blob["flagged_final"], [0, 1])


def test_sbc_remediation_substitutes_draws(tiny_setup, tmp_path):
    """The remediation pass actually substitutes the flagged datasets'
    draws (fresh keys + doubled warmup => different samples than the main
    pass), and SBC_REMEDIATE=False leaves the main-pass draws untouched."""
    prior, est, cfg = tiny_setup
    base = cfg.replace(
        SBC_NUM_DATASETS=2, SBC_POST_SAMPLES=20, WARMUP_STEPS=15,
    )
    out_off = run_sbc(
        base.replace(SBC_REMEDIATE=False, SBC_RHAT_GATE=-1.0),
        prior, est, outdir=tmp_path / "off", seed=0, verbose=False,
    )
    assert out_off["remediation"] is None
    assert out_off["flagged_final"] == [0, 1]  # flagged but not re-run
    out_on = run_sbc(
        base.replace(
            SBC_RHAT_GATE=-1.0, SBC_REMEDIATE=True, SBC_REMEDIATE_ROUNDS=1,
        ),
        prior, est, outdir=tmp_path / "on", seed=0, verbose=False,
    )
    # same main pass (same seed), but remediation replaced the draws
    assert not np.allclose(
        out_off["all_samples"][0], out_on["all_samples"][0]
    )


def test_sbc_remediation_escalates_rounds(tiny_setup, tmp_path):
    """Round-4 VERDICT #4: an impossible gate forces every escalation round
    to run; each round doubles down on warmup (2x, 4x) and records its own
    diagnostics, and the min-RT-informed t_nd init keeps the substituted
    draws valid posterior samples."""
    prior, est, cfg = tiny_setup
    cfg = cfg.replace(
        SBC_NUM_DATASETS=2, SBC_POST_SAMPLES=20, WARMUP_STEPS=10,
        SBC_RHAT_GATE=-1.0,  # flag everything, every round
        SBC_REMEDIATE=True, SBC_REMEDIATE_ROUNDS=2,
        SBC_REMEDIATE_TAU_INIT=True,
    )
    out = run_sbc(cfg, prior, est, outdir=tmp_path, seed=0, verbose=False)
    rem = out["remediation"]
    assert [r["round"] for r in rem["rounds"]] == [1, 2]
    assert [r["warmup"] for r in rem["rounds"]] == [20, 40]
    assert rem["warmup"] == 20  # legacy field = round-1 warmup
    s = np.asarray(out["all_samples"]).reshape(-1, 5)
    assert np.isfinite(s).all()
    assert (s[:, 4] > 0).all() and (s[:, 4] < 1).all()
