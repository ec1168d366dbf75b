"""Top-level driver script (parity with the reference's
rt_choice_model_pipeline.py): run the full simulate -> train -> infer -> SBC
pipeline. Usage: python rt_choice_model_pipeline.py [--preset reference]
[--smoke].

By default this runs the CALIBRATED stack (run_config.CALIBRATED_CONFIG) —
the configuration the SBC rank-uniformity oracle is evidenced against —
rather than the reference's raw defaults, which the repo's own calibration
index (artifacts/CALIBRATION_INDEX.md) shows mis-calibrated at scale.
``--preset reference`` reproduces the reference's exact default field values
(reference run_config.py:4-44).
"""

from sbi_for_diffusion_models_tpu.pipeline import _cli, build_prior_theta, main
from sbi_for_diffusion_models_tpu.run_config import RUN_CONFIG_PARAMS

__all__ = ["build_prior_theta", "main"]

if __name__ == "__main__":
    _cli()
