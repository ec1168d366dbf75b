"""Round-5 flagship candidate selection (driver for run_r5c_queue.sh).

The cond-affine flagship (artifacts/calibration_affine10m_slice_96) still
shows a one-sided tau rank bias (posterior overestimates t_nd; ranks mean
below S/2 = 300). The measured anchors bracket the fix strength:

  tail_sharp_k = 0    (unsharp)  -> tau rank bias ~ -96 (flag4u partial)
  cond-affine, k = 0             -> tau rank bias ~ -73 (affine flagship)
  tail_sharp_k = 1.5  (sharp)    -> tau rank bias ~ +126 (sharp flagship)

so an intermediate k on top of the affine stack should cross zero. Two
candidates (k = 0.9, k = 1.25) each get a cheap 16-dataset SBC; this script
compares their tau rank bias to the affine flagship's and picks the model
for the full 96-dataset run (or "none" when neither candidate beats the
affine baseline, in which case the 2 h window is better spent elsewhere).

Prints "<model.npz> <tag>" (or "none none") on the LAST stdout line for the
shell queue to capture; writes artifacts/r5_candidate_pick.json.
"""

from __future__ import annotations

import json
from pathlib import Path

S_HALF = 300.0  # post_samples = 600 in every round-5 SBC run

RUNS = {
    "k09": "artifacts/calibration_k09_16/summary.json",
    "k125": "artifacts/calibration_k125_16/summary.json",
}
MODELS = {
    "k09": "mnle_10m_shifted_logt_affine_k09.npz",
    "k125": "mnle_10m_shifted_logt_affine_k125.npz",
}
AFFINE_96 = "artifacts/calibration_affine10m_slice_96/summary.json"
# 16-dataset rank-mean SE is ~43; a candidate must clear the affine
# baseline by more than noise AND look roughly centered to justify the
# full-96 window.
MAX_ABS_BIAS = 50.0


def tau_bias(path: str) -> float | None:
    p = Path(path)
    if not p.exists():
        return None
    try:
        return float(json.loads(p.read_text())["ranks_mean"][4]) - S_HALF
    except Exception:
        return None


def main() -> None:
    affine_bias = tau_bias(AFFINE_96)
    if affine_bias is None:
        affine_bias = -73.0  # 68/96-dataset partial measurement
    cands = {t: tau_bias(p) for t, p in RUNS.items()}
    report = {"affine_tau_bias": affine_bias, "candidate_tau_bias": cands}

    scored = [(abs(b), t) for t, b in cands.items() if b is not None]
    winner = None
    if scored:
        best_abs, best_tag = min(scored)
        if best_abs < MAX_ABS_BIAS and best_abs < abs(affine_bias):
            winner = best_tag
    report["winner"] = winner
    Path("artifacts/r5_candidate_pick.json").write_text(
        json.dumps(report, indent=2)
    )
    print(json.dumps(report))
    if winner is None:
        print("none none")
    else:
        print(f"{MODELS[winner]} {winner}")


if __name__ == "__main__":
    main()
