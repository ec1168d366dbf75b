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
