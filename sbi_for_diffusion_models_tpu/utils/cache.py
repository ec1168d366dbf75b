"""Persistent compilation cache setup.

First compiles of the big programs (16k-step simulator, NUTS over the MNLE
potential) cost minutes on this platform and recur in every fresh process.
Enabling JAX's persistent compilation cache amortizes them across processes
and rounds. Call ``enable_persistent_cache()`` before the first jit; the
pipeline CLI and benchmark scripts do this automatically.
"""

from __future__ import annotations

import os
from pathlib import Path

import jax

__all__ = ["enable_persistent_cache"]

_DEFAULT_DIR = "/root/repo/.jax_cache"


def enable_persistent_cache(directory: str | None = None) -> str:
    # SDM_PLATFORM overrides the backend from inside Python. Needed because
    # the environment's sitecustomize pins JAX_PLATFORMS=axon at interpreter
    # start, clobbering shell exports — so `JAX_PLATFORMS=cpu python
    # benchmarks/...` silently still targets the TPU tunnel (and hangs when
    # the tunnel is down). Benchmarks call this helper before their first
    # backend use, making it the one reliable in-process hook.
    plat = os.environ.get("SDM_PLATFORM")
    if plat:
        os.environ["JAX_PLATFORMS"] = plat
        jax.config.update("jax_platforms", plat)
    d = directory or os.environ.get("JAX_CACHE_DIR", _DEFAULT_DIR)
    Path(d).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    return d
