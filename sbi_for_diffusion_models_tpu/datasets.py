"""Real behavioral-data utilities: pack experimental tables into MNLE's x.

The reference's notebook workflow fits rats from ``rat_data_clean.csv`` via a
``make_x_from_rat_df`` helper (reference: src/notebooks/pulse_ddm_model.ipynb
cells 7-9 — per-rat RT + correctness packing); the helper itself lives only in
notebook history. This module makes that capability first-class and
framework-agnostic: it accepts pandas DataFrames or plain dict/ndarray
columns, so pandas is optional.
"""

from __future__ import annotations

from typing import Mapping, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

__all__ = ["make_x_from_rat_df", "split_by_subject"]


def _col(df, name: str) -> np.ndarray:
    if hasattr(df, "columns"):  # pandas DataFrame
        return np.asarray(df[name])
    if isinstance(df, Mapping):
        return np.asarray(df[name])
    raise TypeError(f"unsupported table type {type(df)}")


def make_x_from_rat_df(
    df,
    *,
    rt_col: str = "rt",
    choice_col: str = "choice",
    log_rt: bool = False,
    rt_min: float = 1e-6,
    rt_max: Optional[float] = None,
) -> jnp.ndarray:
    """Pack a behavioral table into the MNLE x-convention (N, 2) [rt, choice].

    Follows the same packing rules as the simulated path (reference
    rt_choice_model.py:332-343): the continuous RT column first (clamped,
    optionally logged), the discrete choice last as float, never logged.
    Rows with non-finite RT or choice are dropped.
    """
    rt = np.asarray(_col(df, rt_col), np.float32)
    choice = np.asarray(_col(df, choice_col), np.float32)
    keep = np.isfinite(rt) & np.isfinite(choice)
    rt, choice = rt[keep], choice[keep]
    rt = np.maximum(rt, rt_min)
    if rt_max is not None:
        rt = np.minimum(rt, rt_max)
    if not np.isin(np.unique(choice), [0.0, 1.0, 2.0]).all():
        raise ValueError(
            f"choice column must be coded in {{0,1,2}}, got values "
            f"{np.unique(choice)[:10]}"
        )
    if log_rt:
        rt = np.log(rt)
    return jnp.asarray(np.stack([rt, choice], axis=-1))


def split_by_subject(
    df, subject_col: str = "subject", **pack_kwargs
) -> Tuple[Sequence, list]:
    """Per-subject packing for independent or hierarchical fits: returns
    (subject_ids, [x_subject ...]) in subject-id order."""
    subjects = np.asarray(_col(df, subject_col))
    ids = sorted(set(subjects.tolist()))
    xs = []
    for sid in ids:
        mask = subjects == sid
        if hasattr(df, "loc"):
            sub = df[mask]
        else:
            sub = {k: np.asarray(v)[mask] for k, v in df.items()}
        xs.append(make_x_from_rat_df(sub, **pack_kwargs))
    return ids, xs
