"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI, so sharding paths are validated on
fake host devices -- the standard JAX substitute for the fake-backend
infrastructure the reference lacks (see SURVEY.md section 4).

Must run before jax initializes its backends, hence this executes at conftest
import time (pytest imports conftest before test modules). Note: the
environment may pin JAX_PLATFORMS=axon (TPU tunnel) via sitecustomize, so a
plain setdefault is not enough -- force both the env var and the jax config.
"""

import os

_ON_TPU = os.environ.get("SDM_TEST_TPU", "") == "1"

if not _ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not _ON_TPU:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

if not _ON_TPU:
    assert len(jax.devices()) == 8, (
        f"expected 8 virtual CPU devices, got {jax.devices()}"
    )


# ---------------------------------------------------------------------------
# Fast/slow split (round-4 VERDICT #8): the statistical / end-to-end tests
# below take 20-120 s each on the virtual-CPU mesh and dominate the suite's
# ~40 min serial wall-clock. They are marked `slow` centrally (from the
# measured --durations profile) so the fast tier still imports and exercises
# every module:
#
#   python -m pytest tests/ -q -m "not slow" -n 4   # fast tier, ~3-4 min
#   python -m pytest tests/ -q                      # full suite, ~40 min
SLOW_TESTS = frozenset({
    # hierarchical joint inference (full NUTS per test)
    "test_hierarchical_inference_batched_datasets",
    "test_hierarchical_inference_with_parallel_tempering",
    "test_hierarchical_inference_with_ensemble",
    "test_simulate_and_infer_tiny",
    # batched SBC driver end-to-end
    "test_run_sbc_batched_shapes_and_files",
    "test_run_sbc_serial_matches_interface",
    "test_run_sbc_batched_with_slice",
    "test_run_sbc_batched_on_mesh",
    "test_run_sbc_batched_with_pulse_rep",
    "test_run_sbc_batched_with_parallel_tempering",
    "test_run_sbc_pt_on_mesh",
    "test_sbc_mixing_gate_remediation",
    "test_sbc_remediation_substitutes_draws",
    "test_sbc_remediation_escalates_rounds",
    # MNLE training / statistical recovery
    "test_training_learns_synthetic_likelihood",
    "test_z_score_x_string_semantics",
    "test_num_categories_explicit_and_validated",
    "test_embedded_training_uses_pulse_block",
    "test_log_theta_dims_train_and_roundtrip",
    "test_censored_rt_likelihood",
    "test_shifted_log_train_recovers_onset",
    "test_append_mode_log_prob_normalizes",
    "test_pulse_rep_learns_atomic_rts",
    "test_pulse_rep_log_prob_normalizes",
    "test_tail_sharp_fused_parity",
    "test_cond_affine_exact_identity",
    "test_cond_affine_normalizes",
    "test_cond_affine_fused_parity",
    # fused Pallas log-prob kernel parity (interpret mode is slow on CPU)
    "test_fused_value_parity",
    "test_fused_gradient_parity",
    "test_fused_vmap_grad_composition",
    "test_fused_pulse_rep_value_and_grad_parity",
    # flow / SNPE / SNLE statistical recovery
    "test_fit_flow_learns_conditional_gaussian",
    "test_snpe_recovers_gaussian_posterior",
    "test_snle_posterior_on_gaussian",
    # MCMC / tempering statistical tests
    "test_nuts_device_loss_rewind_replays_exactly",
    "test_compose_moves_hop_plus_slice",
    "test_pt_recovers_bimodal_weights_plain_nuts_fails",
    "test_mcmc_posterior_pt_path",
    # mesh-sharded training / chains
    "test_tp_train_step_2d_mesh",
    "test_chain_sharded_nuts",
    # ensemble potential end-to-end
    "test_potential_stack_duck_typing",
    # potentials statistical checks
    "test_summed_loglik_matches_manual_tiling",
    "test_potential_prior_plus_tempered_loglik",
})


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest

    for item in items:
        if item.name.split("[")[0] in SLOW_TESTS:
            item.add_marker(_pytest.mark.slow)


# Persistent compilation cache for test runs (opt-in via JAX_CACHE_TEST=1;
# kept opt-in so CI-style cold runs measure honestly): amortizes the big
# sampler/simulator compiles across pytest processes on this 1-core box.
if os.environ.get("JAX_CACHE_TEST", "") == "1":
    from pathlib import Path as _Path

    _d = "/root/repo/.jax_cache_tests"
    _Path(_d).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
