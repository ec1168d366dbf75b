"""Numerical-safety debugging hooks.

The reference has no sanitizers of any kind (single-threaded, nothing to
race; SURVEY.md section 5) — in a pure-functional JAX framework the
equivalent guard rails are NaN/Inf detection and shape/finiteness checks:

* ``nan_guard()`` — context manager enabling ``jax_debug_nans`` so the first
  NaN-producing primitive raises with a traceback (CI usage: wrap a small
  end-to-end slice).
* ``assert_finite`` — host-side finiteness check with a named error, the
  moral equivalent of the reference's inline asserts
  (reference data_simulator.py:62-66).
"""

from __future__ import annotations

import contextlib

import jax
import numpy as np

__all__ = ["nan_guard", "assert_finite"]


@contextlib.contextmanager
def nan_guard():
    """Raise at the first NaN produced by any primitive inside the block."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def assert_finite(name: str, *arrays) -> None:
    """Host-side finiteness assertion with a useful error message."""
    for i, a in enumerate(arrays):
        a = np.asarray(a)
        if not np.isfinite(a).all():
            bad = int((~np.isfinite(a)).sum())
            raise FloatingPointError(
                f"{name}: array {i} has {bad}/{a.size} non-finite values"
            )
