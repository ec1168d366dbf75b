"""Top-level driver script (parity with the reference's
rt_choice_model_pipeline.py): run the full simulate -> train -> infer -> SBC
pipeline with the default RunConfig. Usage: python rt_choice_model_pipeline.py
"""

from sbi_for_diffusion_models_tpu.pipeline import build_prior_theta, main
from sbi_for_diffusion_models_tpu.run_config import RUN_CONFIG_PARAMS

__all__ = ["build_prior_theta", "main"]

if __name__ == "__main__":
    main(RUN_CONFIG_PARAMS)
