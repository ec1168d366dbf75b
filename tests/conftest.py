"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI, so sharding paths are validated on
fake host devices -- the standard JAX substitute for the fake-backend
infrastructure the reference lacks (see SURVEY.md section 4).

Must set the env vars before jax initializes, hence this runs at conftest
import time (pytest imports conftest before test modules).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
