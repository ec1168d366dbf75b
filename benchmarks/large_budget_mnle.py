"""Large-budget MNLE: 1M simulated trials, fully batched on-device
(BASELINE.json config: "Large-budget MNLE: 1M simulated trials, fully
batched on-device simulator, single chip").

Simulates 1,000,000 pulse-DDM trials through the fused kernel, trains the
full-size MNLE on them, and reports wall-clock + throughput per stage as
JSON lines. Usage: python benchmarks/large_budget_mnle.py [--sims 1000000]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

from sbi_for_diffusion_models_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sims", type=int, default=1_000_000)
    p.add_argument("--batch", type=int, default=131_072)
    p.add_argument("--epochs", type=int, default=150)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    from sbi_for_diffusion_models_tpu.data_simulator import (
        simulate_training_set_with_conditions,
        summarize_trials,
    )
    from sbi_for_diffusion_models_tpu.mnle import save_model, train_mnle
    from sbi_for_diffusion_models_tpu.models.rt_choice_model import (
        n_pulses_max_from_schedule,
        pulse_schedule,
    )
    from sbi_for_diffusion_models_tpu.pipeline import build_prior_theta
    from sbi_for_diffusion_models_tpu.proposals import (
        ExtendedProposal,
        PulseSequenceProposal,
    )
    from sbi_for_diffusion_models_tpu.run_config import RUN_CONFIG_PARAMS

    cfg = RUN_CONFIG_PARAMS.replace(
        NUM_SIMULATIONS=args.sims,
        TRAIN_BATCH_SIZE=4096,
        TRAIN_MAX_EPOCHS=args.epochs,
        TRAIN_STOP_AFTER_EPOCHS=15,
    )
    prior = build_prior_theta()
    n_max, spp = pulse_schedule()
    P = n_pulses_max_from_schedule(n_max, spp)
    proposal = ExtendedProposal(prior, PulseSequenceProposal(P, cfg.P_SUCCESS))

    t0 = time.time()
    z, x = simulate_training_set_with_conditions(
        cfg, proposal, batch_size=args.batch, seed=args.seed, verbose=True
    )
    sim_wall = time.time() - t0
    summarize_trials("large-budget", x)
    print(
        json.dumps(
            {
                "metric": "large_budget_sim",
                "value": args.sims * n_max / sim_wall,
                "unit": "nominal trial-steps/s",
                "sims": args.sims,
                "wall_s": sim_wall,
            }
        ),
        flush=True,
    )

    t0 = time.time()
    est = train_mnle(cfg, proposal, z, x, seed=args.seed + 1)
    train_wall = time.time() - t0
    print(
        json.dumps(
            {
                "metric": "large_budget_train",
                "value": train_wall,
                "unit": "s",
                "rows": args.sims,
            }
        ),
        flush=True,
    )
    save_model(est, cfg, filename="mnle_large_budget.npz")


if __name__ == "__main__":
    main()
