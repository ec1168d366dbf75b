"""TPU-native simulation-based inference for pulse-based drift-diffusion models.

A brand-new JAX/XLA/Pallas framework with the capabilities of the reference
``SBI-for-Diffusion-Models`` pipeline (see SURVEY.md): pulse-DDM trial
simulation (vmap+scan / Pallas kernels), a Mixed Neural Likelihood Estimator
(categorical choice head + conditional rational-quadratic-spline flow over
log-RT) in Flax, many-chain NUTS/HMC/slice MCMC over the learned likelihood,
and simulation-based calibration -- all running end-to-end on device and
scaling over a ``jax.sharding.Mesh``.
"""

from . import constants
from .run_config import RunConfig, RUN_CONFIG_PARAMS
from .distributions import (
    Beta,
    BoxUniform,
    LogNormal,
    MultipleIndependent,
    Normal,
    Uniform,
    mcmc_transform,
)
from .models import (
    ChoiceModelParams,
    RTChoiceModelParams,
    choice_model_simulator,
    choice_model_simulator_torch,
    generate_pulse_matrix,
    generate_pulse_matrix_numpy,
    generate_pulse_sides,
    n_pulses_max_from_schedule,
    pack_x_rt_choice,
    pulse_schedule,
    rt_choice_model_simulator,
    rt_choice_model_simulator_torch,
    simulate_session_data_rt_choice,
)

__version__ = "0.1.0"
