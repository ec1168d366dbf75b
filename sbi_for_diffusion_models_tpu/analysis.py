"""Host-side analysis utilities: pairplot and SBC diagnostics.

Owns the behavior of ``sbi.analysis.pairplot`` at the reference call sites
(reference: rt_choice_model_pipeline.py:11,123-131) plus quantitative SBC
uniformity checks (the reference's only correctness oracle is eyeballing the
rank histograms, README.md:109-117; here chi-square / KS statistics make that
oracle testable).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Sequence

import numpy as np

__all__ = ["pairplot", "sbc_uniformity_stats"]


def pairplot(
    samples,
    points=None,
    labels: Optional[Sequence[str]] = None,
    limits=None,
    figsize=(10, 10),
    save_path: str | Path | None = None,
):
    """Corner plot: marginal histograms on the diagonal, 2-D histograms below.

    ``points`` (e.g. theta_true) are overlaid as red markers/lines, matching
    the reference usage ``pairplot(samples, points=theta_true, ...)``
    (reference rt_choice_model_pipeline.py:123-128).
    Returns (fig, axes).
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    samples = np.asarray(samples)
    d = samples.shape[1]
    if labels is None:
        labels = [f"theta_{i}" for i in range(d)]
    if points is not None:
        points = np.asarray(points).reshape(-1)

    fig, axes = plt.subplots(d, d, figsize=figsize)
    for i in range(d):
        for j in range(d):
            ax = axes[i, j]
            if j > i:
                ax.axis("off")
                continue
            if i == j:
                ax.hist(samples[:, i], bins=50, color="#4477aa", density=True)
                if points is not None:
                    ax.axvline(points[i], color="crimson", lw=1.5)
            else:
                ax.hist2d(samples[:, j], samples[:, i], bins=50, cmap="Blues")
                if points is not None:
                    ax.plot(points[j], points[i], "x", color="crimson", ms=8, mew=2)
            if i == d - 1:
                ax.set_xlabel(labels[j])
            if j == 0:
                ax.set_ylabel(labels[i])
    fig.tight_layout()
    if save_path is not None:
        fig.savefig(save_path, dpi=120)
        print(f"[pairplot] wrote {save_path}")
    return fig, axes


def sbc_uniformity_stats(ranks: np.ndarray, num_posterior_samples: int) -> dict:
    """Chi-square and KS uniformity statistics per parameter dimension.

    Under a calibrated posterior, ranks are uniform on {0..S}
    (reference README.md:109-117). Returns per-dim p-values; low p-values
    indicate miscalibration (with few SBC datasets the test is weak — it is a
    smoke alarm, not a certificate).
    """
    from scipy import stats as sps

    ranks = np.asarray(ranks, np.float64)
    n, d = ranks.shape
    out = {"ks_pvalues": [], "chi2_pvalues": []}
    n_bins = min(10, max(n // 2, 2))
    for i in range(d):
        u = (ranks[:, i] + 0.5) / (num_posterior_samples + 1)
        ks = sps.kstest(u, "uniform")
        hist, _ = np.histogram(ranks[:, i], bins=n_bins, range=(0, num_posterior_samples))
        chi2 = sps.chisquare(hist)
        out["ks_pvalues"].append(float(ks.pvalue))
        out["chi2_pvalues"].append(float(chi2.pvalue))
    return out
