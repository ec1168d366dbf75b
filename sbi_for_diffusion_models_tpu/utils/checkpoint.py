"""Training checkpoint/resume via orbax.

The reference's persistence is broken (save/load filename mismatch, loading
from an untrained trainer; reference src/sbi_for_diffusion_models/mnle.py:
247-297, README.md:66,86-87) and a crash mid-run loses everything (SBC
results held in Python lists, reference mnle.py:179-216). This module is the
fault-tolerance tier: full training state (params + optimizer + epoch + RNG
key + config fingerprint) checkpointed with orbax, and per-dataset SBC
artifacts for resume.
"""

from __future__ import annotations

import hashlib
import json
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np

__all__ = [
    "config_fingerprint",
    "save_train_state",
    "restore_train_state",
    "latest_step",
]


def config_fingerprint(cfg) -> str:
    """Stable hash of a (dataclass) config for checkpoint compatibility checks."""
    blob = json.dumps(
        {k: repr(v) for k, v in sorted(cfg.__dict__.items())}, sort_keys=True
    )
    return hashlib.sha256(blob.encode()).hexdigest()[:16]


def _manager(directory: Path):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        directory,
        options=ocp.CheckpointManagerOptions(max_to_keep=3, create=True),
    )


def save_train_state(
    directory: str | Path,
    step: int,
    params: Any,
    opt_state: Any,
    key: jax.Array,
    cfg=None,
    extra: Optional[dict] = None,
) -> None:
    """Checkpoint full training state at `step` (epoch)."""
    import orbax.checkpoint as ocp

    directory = Path(directory).absolute()
    state = {
        "params": params,
        "opt_state": opt_state,
        "key": jax.random.key_data(key),
        "meta": {
            "step": np.asarray(step, np.int64),
        },
    }
    if extra:
        state["extra"] = extra
    mgr = _manager(directory)
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
    if cfg is not None:
        (directory / "config_fingerprint.txt").write_text(config_fingerprint(cfg))


def latest_step(directory: str | Path) -> Optional[int]:
    directory = Path(directory).absolute()
    if not directory.exists():
        return None
    mgr = _manager(directory)
    return mgr.latest_step()


def restore_train_state(
    directory: str | Path,
    abstract_state: dict,
    step: Optional[int] = None,
    cfg=None,
) -> Optional[dict]:
    """Restore training state; returns None when no checkpoint exists.

    ``abstract_state`` must have the same tree structure / shapes / dtypes as
    what was saved (build it from a fresh init). When ``cfg`` is given, a
    fingerprint mismatch raises instead of silently resuming with different
    hyperparameters.
    """
    import orbax.checkpoint as ocp

    directory = Path(directory).absolute()
    step = step if step is not None else latest_step(directory)
    if step is None:
        return None
    if cfg is not None:
        fp_file = directory / "config_fingerprint.txt"
        if fp_file.exists() and fp_file.read_text() != config_fingerprint(cfg):
            raise ValueError(
                f"checkpoint at {directory} was written with a different "
                "config; refusing to resume (delete the directory to restart)"
            )
    mgr = _manager(directory)
    state = mgr.restore(step, args=ocp.args.StandardRestore(abstract_state))
    state["key"] = jax.random.wrap_key_data(state["key"])
    return state
