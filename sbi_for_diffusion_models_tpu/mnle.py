"""MNLE training, persistence, MCMC inference, and SBC orchestration.

API parity with the reference module (src/sbi_for_diffusion_models/mnle.py):
``train_mnle`` (reference :16-50), ``run_inference_mcmc`` (:52-95),
``run_sbc`` (:132-237), ``save_model``/``load_model`` (:247-297) — with the
reference's broken load path fixed (filename mismatch and extraction from an
untrained trainer, reference mnle.py:262,281-291; README.md:66,86-87).

TPU-native design: training is a jitted ``lax.scan`` over minibatches per
epoch (optax Adam, validation early-stopping); inference is many-chain NUTS
(or vectorized slice) vmapped on device; SBC datasets run as a batched axis
instead of the reference's serial Python loop (reference mnle.py:183).
"""

from __future__ import annotations

import dataclasses
import json
import os
from pathlib import Path
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .distributions import Distribution, mcmc_transform
from .inference.mcmc import MCMCPosterior
from .inference.nuts import ReplicaExchange, geometric_ladder, run_nuts
from .models.rt_choice_model import simulate_session_data_rt_choice, pack_x_rt_choice
from .nets.mnle_net import MNLE, MNLEConfig, build_mnle
from .potentials import ThetaOnlyPosteriorPotential, ConditionedMNLELogLikelihood
from .run_config import RunConfig
from .utils.rng import as_key

__all__ = [
    "train_mnle",
    "run_inference_mcmc",
    "run_sbc",
    "save_model",
    "load_model",
    "MNLEEnsemble",
    "load_ensemble",
]


# ---------------------------------------------------------------------------
# Training
# ---------------------------------------------------------------------------
def _make_loss_fn(estimator: MNLE):
    def loss_fn(params, x, z):
        return -jnp.mean(estimator.log_prob_fn(params, x, z))

    return loss_fn


def train_mnle(
    cfg: RunConfig,
    proposal_z,
    z_train,
    x_train,
    device=None,
    *,
    seed: int | jax.Array = 0,
    verbose: bool = True,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 25,
) -> MNLE:
    """Train the MNLE on pre-simulated (z, x) pairs (reference mnle.py:16-50).

    The estimator factory hyperparameters mirror the reference's
    ``likelihood_nn(model="mnle", log_transform_x=cfg.SBI_LOG_TRANSFORM_X,
    z_score_theta="independent", z_score_x=cfg.Z_SCORE_X, hidden_features=128,
    num_transforms=10, num_bins=24)`` (reference mnle.py:31-39).
    ``proposal_z`` is accepted for signature parity (the reference hands it to
    the sbi trainer as the prior); training itself only needs (z, x).
    """
    # Z_SCORE_X is a string in the reference ("independent" / "structured" /
    # None, passed through to sbi at reference mnle.py:35). Our continuous
    # block is the single RT column, for which "structured" (shared scalar
    # stats across the block) and "independent" (per-dimension stats)
    # coincide; both are accepted, anything else is loudly rejected instead
    # of silently doing "independent".
    if cfg.Z_SCORE_X not in (None, "none", "independent", "structured"):
        raise ValueError(
            f"Z_SCORE_X={cfg.Z_SCORE_X!r} not supported: expected None, "
            "'none', 'independent', or 'structured'"
        )
    if cfg.LOG_RT_MANUALLY and cfg.SBI_LOG_TRANSFORM_X:
        # x[:, 0] would already hold log-rt (possibly negative); the estimator
        # would clamp it to 1e-37 and log it AGAIN, silently destroying the
        # data. The reference docs treat these flags as mutually exclusive
        # (reference run_config.py:18,24-25) but never enforce it.
        raise ValueError(
            "LOG_RT_MANUALLY and SBI_LOG_TRANSFORM_X are mutually exclusive: "
            "both would log-transform the RT column twice."
        )
    z = jnp.asarray(z_train, jnp.float32)
    x = jnp.asarray(x_train, jnp.float32)
    n = x.shape[0]
    key = as_key(seed)

    if cfg.MNLE_NUM_CATEGORIES > 0:
        num_categories = cfg.MNLE_NUM_CATEGORIES
        observed_max = int(np.asarray(x[:, 1]).max())
        if observed_max >= num_categories:
            raise ValueError(
                f"MNLE_NUM_CATEGORIES={num_categories} but training data "
                f"contains category {observed_max}"
            )
    else:
        # Infer from data (floored at 3: {0, 1, censored}); brittle only if a
        # variant's rare category is absent from the training draw — set
        # MNLE_NUM_CATEGORIES explicitly there.
        num_categories = int(np.asarray(x[:, 1]).max()) + 1
        num_categories = max(num_categories, 3)
    # Pulse summary embedding (TPU extension): the theta/pulse split of the
    # condition comes from the proposal's own event layout.
    theta_dim = getattr(proposal_z, "theta_dim", None)
    want_pulse_block = cfg.MNLE_EMBED_DIM > 0 or cfg.MNLE_EMBED_MODE == "append"
    pulse_dim = (
        int(z.shape[1]) - int(theta_dim)
        if want_pulse_block and theta_dim is not None
        else 0
    )
    if cfg.MNLE_RT_REP == "pulse":
        import warnings

        # Research scaffolding, not a production estimator: every measured
        # 96-dataset SBC run of the pulse rep failed rank uniformity
        # (KS p down to 4e-16 absolute-anchor, 3e-19 tnd-anchor —
        # artifacts/calibration_pulseabs_*_96; round-2 VERDICT "what's
        # weak" item 2). It remains available because its sharpness is what
        # exposed the posterior's t_nd multimodality.
        warnings.warn(
            "MNLE_RT_REP='pulse' is statistically UNCALIBRATED: all "
            "measured 96-dataset SBC runs failed rank uniformity "
            "(artifacts/calibration_pulseabs_*_96). Use the default "
            "rt_rep='log' (with MNLE_CENSOR_RT=True) for inference you "
            "intend to trust.",
            stacklevel=2,
        )
    mcfg = MNLEConfig(
        condition_dim=int(z.shape[1]),
        num_categories=num_categories,
        hidden_features=cfg.MNLE_HIDDEN_FEATURES,
        num_transforms=cfg.MNLE_NUM_TRANSFORMS,
        num_bins=cfg.MNLE_NUM_BINS,
        tail_bound=cfg.MNLE_TAIL_BOUND,
        log_transform_x=cfg.SBI_LOG_TRANSFORM_X,
        z_score_theta=True,
        z_score_x=cfg.Z_SCORE_X not in (None, "none"),
        trunk_depth=cfg.MNLE_TRUNK_DEPTH,
        pulse_dim=pulse_dim,
        embed_dim=cfg.MNLE_EMBED_DIM if pulse_dim > 0 else 0,
        embed_depth=cfg.MNLE_EMBED_DEPTH,
        embed_mode=cfg.MNLE_EMBED_MODE,
        censor_rt=cfg.MNLE_CENSOR_RT,
        rt_rep=cfg.MNLE_RT_REP,
        grid_anchor=cfg.MNLE_GRID_ANCHOR,
        log_condition_dims=cfg.MNLE_LOG_THETA_DIMS,
        tail_sharp_k=cfg.MNLE_TAIL_SHARP_K,
        tail_sharp_c=cfg.MNLE_TAIL_SHARP_C,
        cond_affine=cfg.MNLE_COND_AFFINE,
    )
    if any(d >= z.shape[1] for d in mcfg.log_condition_dims):
        raise ValueError(
            f"MNLE_LOG_THETA_DIMS={mcfg.log_condition_dims} outside the "
            f"condition block (condition_dim={z.shape[1]})"
        )
    if mcfg.cond_affine and mcfg.rt_rep == "pulse":
        raise ValueError(
            "MNLE_COND_AFFINE has no effect with MNLE_RT_REP='pulse' (the "
            "slot/phase factorization has no continuous spline chain to "
            "precondition); disable one of the two"
        )

    # Standardization stats ("independent" z-scoring, reference mnle.py:34-35)
    # computed on the (optionally log-reparameterized) conditioning view.
    from .nets.mnle_net import transform_condition

    z_cond = transform_condition(mcfg, z)
    cond_mean = jnp.mean(z_cond, axis=0)
    cond_std = jnp.maximum(jnp.std(z_cond, axis=0), 1e-6)
    rt = x[:, 0]
    if mcfg.rt_rep in ("pulse", "shifted_log"):
        theta_dim_stats = theta_dim if theta_dim is not None else 5
        if mcfg.tnd_index >= theta_dim_stats:
            raise ValueError(
                f"tnd_index={mcfg.tnd_index} outside theta block "
                f"(theta_dim={theta_dim_stats})"
            )
    if mcfg.rt_rep == "pulse":
        from .nets.mnle_net import pulse_grid_split

        _, _, t, _, _ = pulse_grid_split(mcfg, rt, z[:, mcfg.tnd_index])
    elif mcfg.rt_rep == "shifted_log":
        from .nets.mnle_net import shifted_rt_transform

        t, _, _ = shifted_rt_transform(mcfg, rt, z)
    else:
        t = jnp.log(jnp.maximum(rt, 1e-37)) if mcfg.log_transform_x else rt
    if mcfg.censor_rt:
        # The flow only ever sees non-censored rows; standardize on those.
        m = (x[:, 1] != mcfg.censored_category).astype(t.dtype)
        denom = jnp.maximum(jnp.sum(m), 1.0)
        x_mean = jnp.sum(t * m) / denom
        x_std = jnp.maximum(
            jnp.sqrt(jnp.sum(m * (t - x_mean) ** 2) / denom), 1e-6
        )
    else:
        x_mean = jnp.mean(t)
        x_std = jnp.maximum(jnp.std(t), 1e-6)

    if mcfg.tail_sharp_k > 0 and mcfg.tail_sharp_c is None:
        # Auto threshold (MNLE_TAIL_SHARP_C=None): place c just below the
        # TRAINING data's left edge in standardized flow units, so the
        # doubly-exponential suppression starts exactly where observed
        # decision times end — real data is never distorted, while the
        # below-support region (where the one-sided tau bias lives) is.
        t_np = np.asarray(t)
        if mcfg.censor_rt:
            t_np = t_np[np.asarray(x[:, 1]) != mcfg.censored_category]
        c_auto = float(
            (np.quantile(t_np, 1e-3) - float(x_mean)) / float(x_std) - 0.25
        )
        mcfg = dataclasses.replace(mcfg, tail_sharp_c=c_auto)
        if verbose:
            print(f"[train_mnle] tail_sharp_c auto -> {c_auto:.3f} "
                  f"(q0.001 of standardized training t - 0.25)")

    estimator = build_mnle(
        jax.random.fold_in(key, 0),
        mcfg,
        cond_mean=cond_mean,
        cond_std=cond_std,
        x_mean=x_mean,
        x_std=x_std,
    )

    # Train/validation split (sbi default behavior: held-out validation loss
    # drives early stopping). The split is INDEX-ONLY: gathering z[tr_idx]
    # would materialize a second full copy of the training set on device
    # (3.4 GB at the 10M-trial budget — measured RESOURCE_EXHAUSTED on the
    # 16 GB chip); instead z/x stay whole and every consumer gathers its
    # minibatch rows through tr_idx/val_idx.
    n_val = max(int(n * cfg.TRAIN_VALIDATION_FRACTION), 1) if n > 10 else 0
    perm = jax.random.permutation(jax.random.fold_in(key, 1), n)
    val_idx, tr_idx = perm[:n_val], perm[n_val:]
    n_tr = int(n - n_val)

    batch_size = min(int(cfg.TRAIN_BATCH_SIZE), n_tr)
    n_batches = max(n_tr // batch_size, 1)

    loss_fn = _make_loss_fn(estimator)
    # Gradient clipping + cosine decay: the raw-Adam loss curve is noisy late
    # in training (spline-flow gradients can spike on tail samples).
    schedule = optax.cosine_decay_schedule(
        cfg.TRAIN_LEARNING_RATE,
        decay_steps=max(n_batches * cfg.TRAIN_MAX_EPOCHS, 1),
        alpha=0.02,
    )
    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(schedule))
    opt_state = tx.init(estimator.params)

    # Training data is an explicit jit argument, NOT a closure: closed-over
    # arrays are baked into the program as constants, which at 1M-trial
    # budgets makes the compile payload hundreds of MB.
    @jax.jit
    def epoch_step(params, opt_state, perm_idx, tr_idx, x, z):
        def body(carry, idx):
            params, opt_state = carry
            xb = jnp.take(x, idx, axis=0)
            zb = jnp.take(z, idx, axis=0)
            loss, grads = jax.value_and_grad(loss_fn)(params, xb, zb)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        # perm_idx permutes the training subset; map through tr_idx to rows
        # of the full arrays (a small int32 gather, not a data copy).
        rows = jnp.take(tr_idx, perm_idx[: n_batches * batch_size], axis=0)
        batches = rows.reshape(n_batches, batch_size)
        (params, opt_state), losses = jax.lax.scan(body, (params, opt_state), batches)
        return params, opt_state, jnp.mean(losses)

    @jax.jit
    def val_loss_fn(params, val_idx, x, z):
        if n_val == 0:
            return jnp.float32(0.0)
        return loss_fn(
            params, jnp.take(x, val_idx, axis=0), jnp.take(z, val_idx, axis=0)
        )

    import time as _time

    train_t0 = _time.time()
    params = estimator.params
    best_params = params
    best_val = np.inf
    epochs_since_best = 0
    start_epoch = 0
    last_epoch = start_epoch

    if checkpoint_dir is not None:
        from .utils.checkpoint import restore_train_state, save_train_state

        abstract = {
            "params": params,
            "opt_state": opt_state,
            "key": jax.random.key_data(key),
            "meta": {"step": np.asarray(0, np.int64)},
        }
        restored = restore_train_state(checkpoint_dir, abstract, cfg=cfg)
        if restored is not None:
            params = restored["params"]
            opt_state = restored["opt_state"]
            start_epoch = int(restored["meta"]["step"]) + 1
            best_params = params
            if verbose:
                print(f"[train_mnle] resumed from epoch {start_epoch - 1}")

    for epoch in range(start_epoch, cfg.TRAIN_MAX_EPOCHS):
        last_epoch = epoch
        perm_idx = jax.random.permutation(jax.random.fold_in(key, 100 + epoch), n_tr)
        params, opt_state, tr_loss = epoch_step(
            params, opt_state, perm_idx, tr_idx, x, z
        )
        vl = float(val_loss_fn(params, val_idx, x, z)) if n_val > 0 else float(tr_loss)
        if vl < best_val - 1e-5:
            best_val = vl
            best_params = params
            epochs_since_best = 0
        else:
            epochs_since_best += 1
        if verbose and epoch % 10 == 0:
            print(f"[train_mnle] epoch {epoch}: train={float(tr_loss):.4f} val={vl:.4f}")
        if checkpoint_dir is not None and (epoch + 1) % checkpoint_every == 0:
            save_train_state(
                checkpoint_dir, epoch, params, opt_state,
                jax.random.fold_in(key, 100 + epoch), cfg=cfg,
            )
        if epochs_since_best >= cfg.TRAIN_STOP_AFTER_EPOCHS:
            if verbose:
                print(f"[train_mnle] converged at epoch {epoch} (best val {best_val:.4f})")
            break

    return MNLE(
        cfg=mcfg,
        params=best_params,
        cond_mean=estimator.cond_mean,
        cond_std=estimator.cond_std,
        x_mean=estimator.x_mean,
        x_std=estimator.x_std,
        train_meta={
            "num_train": int(n),
            "epochs_run": int(last_epoch - start_epoch + 1),
            "best_val_loss": float(best_val) if np.isfinite(best_val) else None,
            "train_wall_s": round(_time.time() - train_t0, 1),
        },
    )


# ---------------------------------------------------------------------------
# Persistence (fixing the reference's broken save/load, mnle.py:241-297)
# ---------------------------------------------------------------------------
def _model_dir() -> Path:
    d = Path(os.environ.get("MODEL_DIR", Path.home() / "models"))
    d.mkdir(parents=True, exist_ok=True)
    return d


_DEFAULT_MODEL_FILENAME = "mnle_rt_choice_model.npz"


def save_model(
    estimator: MNLE,
    cfg: Optional[RunConfig] = None,
    filename: str = _DEFAULT_MODEL_FILENAME,
) -> Path:
    """Save estimator params + stats + config to one .npz
    (replaces reference mnle.py:247-259; same default basename for both save
    and load, unlike the reference's mismatch at mnle.py:247,262)."""
    path = _model_dir() / filename
    leaves = {}
    flat = jax.tree_util.tree_flatten_with_path(estimator.params)[0]
    for key_path, leaf in flat:
        leaves["param:" + jax.tree_util.keystr(key_path)] = np.asarray(leaf)
    leaves["stat:cond_mean"] = np.asarray(estimator.cond_mean)
    leaves["stat:cond_std"] = np.asarray(estimator.cond_std)
    leaves["stat:x_mean"] = np.asarray(estimator.x_mean)
    leaves["stat:x_std"] = np.asarray(estimator.x_std)
    import hashlib

    fp = hashlib.sha256()
    for name in sorted(k for k in leaves if k.startswith("param:")):
        fp.update(leaves[name].tobytes())
    meta = {
        "mnle_config": estimator.cfg.__dict__,
        "run_config": cfg.__dict__ if cfg is not None else None,
        "train_meta": estimator.train_meta,
        "param_fingerprint": fp.hexdigest()[:16],
    }
    np.savez(path, __meta__=json.dumps(meta), **leaves)
    print(f"[save_model] wrote {path}")
    return path


def load_model(filename: str = _DEFAULT_MODEL_FILENAME) -> MNLE:
    """Rebuild a trained estimator from disk (reference load is broken —
    mnle.py:262,281-291; this one round-trips)."""
    path = _model_dir() / filename
    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["__meta__"]))
    mcfg = MNLEConfig(**meta["mnle_config"])
    skeleton = build_mnle(jax.random.key(0), mcfg)
    flat, treedef = jax.tree_util.tree_flatten_with_path(skeleton.params)
    params = jax.tree_util.tree_unflatten(
        treedef,
        [jnp.asarray(data["param:" + jax.tree_util.keystr(kp)]) for kp, _ in flat],
    )
    return MNLE(
        cfg=mcfg,
        params=params,
        cond_mean=jnp.asarray(data["stat:cond_mean"]),
        cond_std=jnp.asarray(data["stat:cond_std"]),
        x_mean=jnp.asarray(data["stat:x_mean"]),
        x_std=jnp.asarray(data["stat:x_std"]),
        train_meta=meta.get("train_meta"),
    )


# ---------------------------------------------------------------------------
# Deep ensembles
# ---------------------------------------------------------------------------
class MNLEEnsemble:
    """Uniform mixture of K independently trained MNLEs.

    The ensemble's likelihood is the predictive mixture
    ``log p(x|c) = logsumexp_k log p_k(x|c) - log K`` — the standard deep-
    ensemble posterior-predictive for neural likelihood estimation. It
    averages out seed/data-idiosyncratic estimator bias (the SBC rank
    profile is model-determined here: per-dataset ranks correlate 0.8-0.98
    across samplers for one model) and widens the likelihood exactly where
    members disagree, countering the over-shrunk v/B response measured in
    ``artifacts/calibration_censor_pt_96`` (corr(v_true, v_rank) = +0.38).

    Duck-types the trained-``MNLE`` surface that potentials / MCMC / SBC
    consume (``dispatch_log_prob``, ``log_prob_fn``, ``params``,
    ``sample_fn``, ``cfg``, ``train_meta``); no reference counterpart —
    the reference trains a single estimator (mnle.py:16-50).
    """

    def __init__(self, members):
        members = tuple(members)
        if not members:
            raise ValueError("MNLEEnsemble needs at least one member")
        c0 = members[0].cfg
        for m in members[1:]:
            if m.cfg != c0:
                raise ValueError(
                    "ensemble members must share one MNLEConfig "
                    f"(got {m.cfg} vs {c0})"
                )
        self.members = members
        # Stable tuple object so potentials' fused-path identity guard
        # (`params is not est.params`) works for ensembles too.
        self.params = tuple(m.params for m in members)
        self.cfg = c0
        self.cond_mean = members[0].cond_mean
        self.cond_std = members[0].cond_std
        self.x_mean = members[0].x_mean
        self.x_std = members[0].x_std
        metas = [m.train_meta or {} for m in members]
        self.train_meta = {
            "ensemble_size": len(members),
            "num_train": sum(t.get("num_train") or 0 for t in metas) or None,
            "num_train_per_member": [t.get("num_train") for t in metas],
            "best_val_loss": [t.get("best_val_loss") for t in metas],
        }

    def __len__(self):
        return len(self.members)

    def log_prob_fn(self, params, x, condition):
        lps = jnp.stack(
            [
                m.log_prob_fn(p, x, condition)
                for m, p in zip(self.members, params)
            ]
        )
        return jax.scipy.special.logsumexp(lps, axis=0) - jnp.log(len(self.members))

    def log_prob(self, x, condition):
        return self.log_prob_fn(self.params, jnp.asarray(x), jnp.asarray(condition))

    def dispatch_log_prob(self, kernel: str = "auto", *, interpret: bool = False):
        fns = [
            m.dispatch_log_prob(kernel, interpret=interpret)
            for m in self.members
        ]
        logk = jnp.log(float(len(fns)))

        def lp(x, condition):
            lps = jnp.stack([f(x, condition) for f in fns])
            return jax.scipy.special.logsumexp(lps, axis=0) - logk

        return lp

    def sample_fn(self, params, key, condition):
        """Mixture draw: pick a member uniformly per condition row."""
        k_idx, k_draw = jax.random.split(as_key(key))
        condition = jnp.asarray(condition)
        rows = condition.shape[0] if condition.ndim > 1 else 1
        idx = jax.random.randint(k_idx, (rows,), 0, len(self.members))
        draws = jnp.stack(
            [
                m.sample_fn(p, jax.random.fold_in(k_draw, i), condition)
                for i, (m, p) in enumerate(zip(self.members, params))
            ]
        )  # (K, rows, 2)
        return jnp.take_along_axis(draws, idx[None, :, None], axis=0)[0]

    def sample(self, key, condition):
        return self.sample_fn(self.params, key, jnp.asarray(condition))


def load_ensemble(filenames) -> MNLEEnsemble:
    """Build an :class:`MNLEEnsemble` from saved member files (accepts a
    list or one comma-separated string of ``save_model`` filenames)."""
    if isinstance(filenames, str):
        filenames = [f for f in filenames.split(",") if f]
    return MNLEEnsemble([load_model(f) for f in filenames])


# ---------------------------------------------------------------------------
# Inference
# ---------------------------------------------------------------------------
def run_inference_mcmc(
    cfg: RunConfig,
    prior_theta: Distribution,
    density_estimator: MNLE,
    x_o,
    pulses_o,
    device=None,
    *,
    seed: int | jax.Array = 0,
    verbose: bool = True,
) -> jnp.ndarray:
    """Posterior sampling over theta given an observed session
    (reference mnle.py:52-95). Returns (POSTERIOR_SAMPLES, theta_dim).

    The potential is log prior(theta) + sum_i log p(x_i | theta, s_i)/T
    (reference potentials.py:43-57) run through the constrained->unconstrained
    ``mcmc_transform`` bijection (reference mnle.py:75). Chains are vmapped on
    device: NUTS with warmup adaptation by default, or the vectorized slice
    sampler (cfg.MCMC_METHOD="slice"), the fallback the reference notebooks
    rely on (ryans_test.ipynb cell 4).
    """
    likelihood = ConditionedMNLELogLikelihood(
        density_estimator, pulses_o, logprob_kernel=cfg.MNLE_LOGPROB_KERNEL
    )
    potential = ThetaOnlyPosteriorPotential(
        prior=prior_theta,
        likelihood=likelihood,
        x_o=x_o,
        temperature=cfg.TEMPERATURE,
    )
    bij = mcmc_transform(prior_theta)
    mode_hop = None
    if cfg.MCMC_GRID_HOP:
        from .constants import PULSE_INTERVAL
        from .inference.mcmc import make_grid_hop

        # t_nd (theta[4]) is identifiable only up to pulse-grid aliasing;
        # hop between the near-periodic modes (see make_grid_hop).
        mode_hop = make_grid_hop(bij, index=4, delta=PULSE_INTERVAL)
    if cfg.MCMC_TAU_SLICE:
        from .inference.mcmc import compose_moves, make_dim_slice

        # Within-basin t_nd mixer for hard-onset likelihoods (see
        # run_config.MCMC_TAU_SLICE); hop first (cross-mode), then slice.
        mode_hop = compose_moves(
            mode_hop, make_dim_slice(4, width=cfg.MCMC_TAU_SLICE_WIDTH)
        )
    posterior = MCMCPosterior(
        potential_fn=potential,
        proposal=prior_theta,
        theta_transform=bij,
        method=cfg.MCMC_METHOD,
        num_chains=cfg.NUM_CHAINS,
        warmup_steps=cfg.WARMUP_STEPS,
        thin=cfg.MCMC_THIN,
        max_tree_depth=cfg.MCMC_MAX_TREE_DEPTH,
        target_accept=cfg.MCMC_TARGET_ACCEPT,
        verbose=verbose,
        mode_hop=mode_hop,
        auto_fallback=cfg.MCMC_AUTO_FALLBACK,
        pt_replicas=cfg.MCMC_PT_REPLICAS,
        pt_beta_min=cfg.MCMC_PT_BETA_MIN,
        pt_swap_every=cfg.MCMC_PT_SWAP_EVERY,
    )
    samples = posterior.sample(
        (cfg.POSTERIOR_SAMPLES,), x=x_o, key=as_key(seed)
    )
    return samples


# ---------------------------------------------------------------------------
# Simulation-based calibration
# ---------------------------------------------------------------------------
def _compute_ranks(samples: np.ndarray, theta_true: np.ndarray) -> np.ndarray:
    """Per-dimension rank of theta_true among posterior samples
    (reference mnle.py:98-104)."""
    return (np.asarray(samples) < np.asarray(theta_true).reshape(1, -1)).sum(axis=0)


def _plot_sbc_rank_histograms(
    ranks: np.ndarray,
    num_samples: int,
    outdir: Path,
    param_names=None,
) -> Path:
    """Per-parameter rank histograms (reference mnle.py:107-130)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    ranks = np.asarray(ranks)
    d = ranks.shape[1]
    if param_names is None:
        param_names = [f"theta_{i}" for i in range(d)]
    fig, axes = plt.subplots(1, d, figsize=(3 * d, 3))
    if d == 1:
        axes = [axes]
    n_bins = min(20, max(ranks.shape[0] // 2, 5))
    expected = ranks.shape[0] / n_bins
    for i, ax in enumerate(axes):
        ax.hist(ranks[:, i], bins=n_bins, range=(0, num_samples), color="#4477aa")
        ax.axhline(expected, color="k", ls="--", lw=1)
        ax.set_title(param_names[i])
        ax.set_xlabel("rank")
    fig.tight_layout()
    path = Path(outdir) / "sbc_rank_histograms.png"
    fig.savefig(path, dpi=120)
    plt.close(fig)
    print(f"[run_sbc] wrote {path}")
    # High-power companion diagnostic: ECDF-difference with a simultaneous
    # confidence band (histograms hide small systematic bias).
    from .analysis import sbc_ecdf_plot

    sbc_ecdf_plot(ranks, num_samples, Path(outdir) / "sbc_ecdf.png", param_names)
    return path


def _run_sbc_batched(
    cfg: RunConfig,
    prior_theta: Distribution,
    density_estimator: MNLE,
    num_datasets: int,
    post_samples: int,
    outdir: Path,
    key: jax.Array,
    verbose: bool,
    group_size: int = 8,
    mesh=None,
) -> dict:
    """All SBC datasets x chains in one compiled NUTS program.

    The reference runs datasets serially (reference mnle.py:183) — and a
    serial JAX port would recompile the sampler per dataset because the
    conditioning data is baked into the potential closure. Here the dataset
    axis is folded into the chain axis: one simulator call makes every
    session, and ``run_nuts(data=...)`` gives each chain its dataset's
    (x_o, pulses_o). One compile, full device parallelism.

    Datasets are processed in groups of ``group_size`` with identical shapes,
    so the NUTS program compiles once and is reused per group — very large
    single launches (hundreds of chains x full warmup in one XLA execution)
    have crashed the TPU worker, and grouping bounds the per-launch size
    without extra compiles.
    """
    import math as _math

    from .models.rt_choice_model import (
        generate_pulse_matrix,
        n_pulses_max_from_schedule,
        pulse_schedule,
        rt_choice_model_simulator_torch,
    )

    D, C, T = num_datasets, cfg.NUM_CHAINS, cfg.NUM_TRIALS_OBS
    est = density_estimator
    bij = mcmc_transform(prior_theta)

    theta_true = prior_theta.sample(jax.random.fold_in(key, 0), (D,))
    n_max, spp = pulse_schedule()
    P = n_pulses_max_from_schedule(n_max, spp)
    pulses = generate_pulse_matrix(
        jax.random.fold_in(key, 1), D * T, P, p_success=cfg.P_SUCCESS
    )
    theta_rep = jnp.repeat(theta_true, T, axis=0)
    x = rt_choice_model_simulator_torch(
        theta_rep,
        rng=jax.random.fold_in(key, 2),
        mu_sensory=cfg.MU_SENSORY,
        pulse_sides=pulses,
    )
    x = pack_x_rt_choice(x, log_rt=cfg.LOG_RT_MANUALLY)
    x_d = x.reshape(D, T, 2)
    s_d = pulses.reshape(D, T, P)

    temperature = cfg.TEMPERATURE
    lp_fn = est.dispatch_log_prob(cfg.MNLE_LOGPROB_KERNEL)
    mode_hop = None
    if cfg.MCMC_GRID_HOP:
        from .constants import PULSE_INTERVAL
        from .inference.mcmc import make_grid_hop

        mode_hop = make_grid_hop(bij, index=4, delta=PULSE_INTERVAL)
    if cfg.MCMC_TAU_SLICE:
        from .inference.mcmc import compose_moves, make_dim_slice

        mode_hop = compose_moves(
            mode_hop, make_dim_slice(4, width=cfg.MCMC_TAU_SLICE_WIDTH)
        )

    # Parallel tempering: R replicas per (dataset, chain), contiguous, cold
    # rung first; beta rides in ``data`` so one compiled logp serves every
    # rung (inference/nuts.ReplicaExchange).
    R = max(int(cfg.MCMC_PT_REPLICAS), 1)
    if R > 1 and cfg.MCMC_METHOD in ("slice", "slice_np_vectorized"):
        raise ValueError(
            "MCMC_PT_REPLICAS > 1 requires the NUTS driver "
            "(parallel tempering is not wired into run_slice)"
        )
    ladder = geometric_ladder(R, cfg.MCMC_PT_BETA_MIN)

    def _ll(u, data):
        """Untempered summed log-likelihood term (what beta multiplies)."""
        x_o, s_o = data[0], data[1]
        theta = bij.forward(u)
        cond = jnp.concatenate(
            [jnp.broadcast_to(theta, (s_o.shape[0], theta.shape[-1])), s_o],
            axis=-1,
        )
        return jnp.sum(lp_fn(x_o, cond)) / temperature

    def logp(u, data):
        theta = bij.forward(u)
        lp = prior_theta.log_prob(theta) + bij.forward_log_det(u)
        beta = data[2] if R > 1 else 1.0
        return lp + beta * _ll(u, data)

    per_chain = _math.ceil(post_samples / C)
    G = min(group_size, D)  # datasets per launch
    n_groups = _math.ceil(D / G)
    pooled_groups = []
    accepts, divergences, swap_accepts = [], [], []
    rhat_per_ds, ess_per_ds, div_per_ds = [], [], []

    # Crash-resume guard: segment checkpoints are only valid for the same
    # (key, workload shape); clear any stale ones from a different run.
    import hashlib as _hashlib
    import shutil as _shutil

    run_id = _hashlib.sha256(
        np.asarray(jax.random.key_data(key)).tobytes()
        + f"{D}/{C}/{cfg.WARMUP_STEPS}/{per_chain}/{T}/R={R}".encode()
    ).hexdigest()[:16]
    ckpt_root = outdir / "nuts_ckpt"
    run_id_file = ckpt_root / "run_id.txt"
    if ckpt_root.exists() and (
        not run_id_file.exists() or run_id_file.read_text() != run_id
    ):
        _shutil.rmtree(ckpt_root)
    ckpt_root.mkdir(parents=True, exist_ok=True)
    run_id_file.write_text(run_id)
    # Stale partials from a previous run in the same outdir would read as a
    # (misleading) snapshot of THIS run until group 1 lands; clear them up
    # front (the run_id guard above already does this for NUTS segments).
    for stale in ("sbc_ranks.partial.npy", "partial_summary.json"):
        (outdir / stale).unlink(missing_ok=True)
    if verbose:
        print(
            f"[run_sbc] batched: {n_groups} groups of {G} datasets x {C} chains, "
            f"{per_chain} draws/chain (first group includes the NUTS compile)",
            flush=True,
        )
    from .inference.diagnostics import effective_sample_size, split_r_hat

    def _mixing_stats(cold_gi):
        """(split-R-hat max, min-ESS) over one dataset's cold chains."""
        if C >= 2 and per_chain >= 10:
            return (
                float(np.max(split_r_hat(cold_gi))),
                float(np.min(effective_sample_size(cold_gi))),
            )
        return (float("nan"), float("nan"))

    def _launch(idx, k_init, k_run, warmup, ladder_arr, ckpt_name,
                tau_init=False):
        """One sampler launch over len(idx) datasets x C chains x R replicas.

        Shared by the main pass and the mixing-remediation pass (same
        program modulo warmup/ladder). Returns (cold draws
        (Gl, C, per_chain, dim) np.ndarray, per-dataset cold divergence
        counts or None, mean accept, total divergences or None,
        swap acceptance or None).

        ``tau_init=True`` replaces the prior draw of the t_nd column with a
        min-RT-informed init: t_nd < min(rt) over the session by
        construction (rt = t_nd + hit_step*dt, reference
        rt_choice_model.py:218), so hard-onset posteriors concentrate just
        below min(rt) and prior inits frequently start chains in a far
        basin the tempered ladder then has to cross. Data-dependent inits
        do not change the stationary distribution — only where the chains
        start.
        """
        Gl = int(idx.shape[0])
        x_g = x_d[idx]
        s_g = s_d[idx]
        init_theta = prior_theta.sample(k_init, (Gl * C * R,))
        if tau_init and init_theta.shape[-1] == 5:
            rt_col = x_g[..., 0]
            if cfg.LOG_RT_MANUALLY:
                rt_col = jnp.exp(rt_col)
            minrt = jnp.repeat(jnp.min(rt_col, axis=-1), C * R)  # (Gl*C*R,)
            u01 = jax.random.uniform(
                jax.random.fold_in(k_init, 1), (Gl * C * R,),
                minval=0.05, maxval=0.95,
            )
            tau0 = jnp.clip(u01 * minrt, 1e-3, 0.98)
            init_theta = init_theta.at[:, 4].set(tau0)
        init_u = bij.inverse(jnp.asarray(init_theta, jnp.float32))
        data = jax.tree.map(lambda a: jnp.repeat(a, C * R, axis=0), (x_g, s_g))
        if R > 1:
            beta_rows = jnp.tile(jnp.asarray(ladder_arr, jnp.float32), Gl * C)
            data = data + (beta_rows,)
        n_real_chains = Gl * C * R
        if mesh is not None:
            # Shard the folded (dataset x chain x replica) axis over the
            # mesh: rows only couple within a replica group (the DEO swap),
            # so padding must append WHOLE groups — pad to a multiple of
            # lcm(n_dev, R) by wrap-around; padded rows are complete replica
            # groups copied from the front and are dropped after sampling.
            from jax.sharding import NamedSharding, PartitionSpec as _P

            from .parallel.mesh import pad_to_multiple

            n_dev = mesh.devices.size
            mult = n_dev * R // _math.gcd(n_dev, R)
            init_u, _ = pad_to_multiple(init_u, mult)
            data = jax.tree.map(lambda a: pad_to_multiple(a, mult)[0], data)
            axis = mesh.axis_names[0]
            init_u = jax.device_put(init_u, NamedSharding(mesh, _P(axis)))
            data = jax.tree.map(
                lambda a: jax.device_put(
                    a, NamedSharding(mesh, _P(axis, *([None] * (a.ndim - 1))))
                ),
                data,
            )
        exchange = None
        if R > 1:
            exchange = ReplicaExchange(
                n_replicas=R,
                betas=data[2],  # padded along with the rows
                ll_fn=_ll,
                swap_every=cfg.MCMC_PT_SWAP_EVERY,
            )
        if cfg.MCMC_METHOD in ("slice", "slice_np_vectorized"):
            from .inference.slice import run_slice

            samples_u, info = run_slice(
                k_run,
                logp,
                init_u,
                num_warmup=warmup,
                num_samples=per_chain,
                thin=cfg.MCMC_THIN,
                data=data,
                mode_hop=mode_hop,
            )
        else:
            samples_u, info = run_nuts(
                k_run,
                logp,
                init_u,
                num_warmup=warmup,
                num_samples=per_chain,
                max_depth=cfg.MCMC_MAX_TREE_DEPTH,
                target_accept=cfg.MCMC_TARGET_ACCEPT,
                thin=cfg.MCMC_THIN,
                data=data,
                mode_hop=mode_hop,
                exchange=exchange,
                checkpoint_dir=str(outdir / "nuts_ckpt" / ckpt_name),
            )
        samples_u = samples_u[:n_real_chains]  # drop mesh-padding chains
        theta_s = bij.forward(samples_u)  # (Gl*C*R, S, dim)
        dim = theta_s.shape[-1]
        # Keep only the cold (beta = 1) rung of each replica group.
        theta_cold = theta_s.reshape(Gl, C, R, per_chain, dim)[:, :, 0]
        # Per-dataset divergence counts over the cold chains (NUTS only):
        # divergences concentrate on datasets whose posterior mass piles
        # against hard likelihood boundaries (e.g. the shifted-log onset
        # wall), and a pooled per-group count hides which ones.
        div_cold = None
        if "diverging" in info and np.asarray(info["diverging"]).ndim == 2:
            d_np = np.asarray(info["diverging"])[:n_real_chains]
            div_cold = d_np.reshape(Gl, C, R, -1)[:, :, 0].sum(axis=(1, 2))
        acc = float(jnp.mean(info["accept_prob"]))
        div_total = (
            int(jnp.sum(info["diverging"])) if "diverging" in info else None
        )
        return (
            np.asarray(theta_cold),
            div_cold,
            acc,
            div_total,
            info.get("swap_accept"),
        )

    for g in range(n_groups):
        lo = g * G
        idx = (jnp.arange(G) + lo) % D  # pad final group by wrap-around
        cold_np, div_cold, acc, div_total, swap = _launch(
            idx,
            jax.random.fold_in(key, 300 + g),
            jax.random.fold_in(key, 400 + g),
            cfg.WARMUP_STEPS,
            ladder,
            f"group_{g}",
        )
        # (G, C, S, dim) -> interleave chains -> (G, C*S, dim) -> trim.
        pooled = (
            cold_np.swapaxes(1, 2)
            .reshape(G, C * per_chain, -1)[:, :post_samples]
        )
        pooled_groups.append(pooled)
        # Per-dataset mixing diagnostics over the COLD chains: pooled ranks
        # from unmixed chains silently bias every headline uniformity
        # number (round-2 finding: split-R-hat up to ~365 with zero
        # divergences), so record split-R-hat and min-ESS per dataset.
        for gi in range(G):
            if lo + gi >= D:
                break  # wrap-around padding of the final group
            div_per_ds.append(
                float(div_cold[gi]) if div_cold is not None else float("nan")
            )
            r_, e_ = _mixing_stats(cold_np[gi])
            rhat_per_ds.append(r_)
            ess_per_ds.append(e_)
        # Report only statistics the sampler actually produced: slice has no
        # divergence notion (its accept_prob is the shrinkage success rate).
        accepts.append(acc)
        divergences.append(div_total)
        swap_accepts.append(swap)
        if verbose:
            div_str = "n/a" if divergences[-1] is None else str(divergences[-1])
            sw_str = (
                f" swap_accept={swap_accepts[-1]:.3f}"
                if swap_accepts[-1] is not None
                else ""
            )
            print(
                f"[run_sbc] group {g + 1}/{n_groups}: {G} datasets x {C} chains"
                f"{' x ' + str(R) + ' replicas' if R > 1 else ''} "
                f"mean_accept={accepts[-1]:.3f} divergences={div_str}{sw_str}"
            )
        # Incremental partial results: a wall-clock-capped or crashed run
        # must leave a READABLE uniformity readout over the datasets it
        # finished — not just opaque NUTS segment checkpoints. (Headline
        # 96-dataset SBC runs take ~1.5 h; round-3 sessions repeatedly lost
        # the whole summary to tunnel drops and timeouts.) Cheap: ranks are
        # O(D*S*dim) host work per group.
        done = min((g + 1) * G, D)
        part = np.concatenate(pooled_groups, axis=0)[:done]
        tt_np = np.asarray(theta_true)
        part_ranks = (part < tt_np[:done, None, :]).sum(axis=1)
        partial = {
            "datasets_done": int(done),
            "datasets_total": int(D),
            "rhat_max_per_dataset": [float(v) for v in rhat_per_ds[:done]],
            "min_ess_per_dataset": [float(v) for v in ess_per_ds[:done]],
            "divergences_per_dataset": [float(v) for v in div_per_ds[:done]],
        }
        if done >= 8:  # uniformity tests are meaningless below ~8 datasets
            try:
                from .analysis import sbc_uniformity_stats

                stats = sbc_uniformity_stats(part_ranks, post_samples)
                partial.update(
                    ks_pvalues=stats["ks_pvalues"],
                    chi2_pvalues=stats["chi2_pvalues"],
                )
            except Exception:  # scipy quirks must not kill the run
                pass
        # Atomic: write to a temp file then os.replace, so a crash mid-write
        # never leaves a corrupt/truncated snapshot (ADVICE round 3).
        import json as _json
        import os as _os

        tmp_npy = outdir / "sbc_ranks.partial.tmp.npy"
        np.save(tmp_npy, part_ranks)
        _os.replace(tmp_npy, outdir / "sbc_ranks.partial.npy")
        tmp_js = outdir / "partial_summary.json.tmp"
        tmp_js.write_text(_json.dumps(partial, indent=2))
        _os.replace(tmp_js, outdir / "partial_summary.json")

    samples_np = np.concatenate(pooled_groups, axis=0)[:D]
    rhat_np = np.asarray(rhat_per_ds[:D], dtype=float)
    ess_np = np.asarray(ess_per_ds[:D], dtype=float)
    div_np = np.asarray(div_per_ds[:D], dtype=float)

    # ---- Mixing gate + remediation (round-3 VERDICT #2): rather than pool
    # ranks from unmixed chains, re-run flagged datasets ONCE with doubled
    # warmup and a hotter ladder, substitute their draws unconditionally
    # (the remediated config strictly dominates, so this is not a
    # cherry-pick between runs), and record before/after diagnostics. The
    # reference pools blindly (reference mnle.py:218).
    def _flagged_idx():
        return np.where(
            (~np.isfinite(rhat_np))
            | (rhat_np > cfg.SBC_RHAT_GATE)
            | (ess_np < cfg.SBC_MIN_ESS_GATE)
        )[0]

    gate_active = C >= 2 and per_chain >= 10
    remediation = None
    flagged0 = _flagged_idx() if gate_active else np.asarray([], dtype=int)
    if cfg.SBC_REMEDIATE and flagged0.size:
        todo0 = flagged0[: int(cfg.SBC_REMEDIATE_MAX)]
        rhat_before = rhat_np[todo0].tolist()
        n_rounds = max(int(cfg.SBC_REMEDIATE_ROUNDS), 1)
        rounds = []
        warm1, beta1 = None, None
        todo = todo0
        for rnd in range(1, n_rounds + 1):
            if rnd > 1:
                # Escalate only the datasets the previous round left dirty.
                todo = np.intersect1d(_flagged_idx(), todo0)
                if todo.size == 0:
                    break
            warm2 = 2 * rnd * cfg.WARMUP_STEPS
            beta2 = cfg.MCMC_PT_BETA_MIN / (2.0 ** rnd) if R > 1 else None
            hot = geometric_ladder(R, beta2) if R > 1 else ladder
            if rnd == 1:
                warm1, beta1 = warm2, beta2
            if verbose:
                print(
                    f"[run_sbc] mixing gate round {rnd}: {todo.size}/{D} "
                    f"datasets flagged (R-hat > {cfg.SBC_RHAT_GATE} or "
                    f"min-ESS < {cfg.SBC_MIN_ESS_GATE}); remediating with "
                    f"warmup {warm2}"
                    + (f", beta_min {beta2}" if beta2 is not None else ""),
                    flush=True,
                )
            for rg in range(_math.ceil(todo.size / G)):
                sub = todo[rg * G:(rg + 1) * G]
                idx = jnp.asarray(np.resize(sub, G))  # pad by wrap within sub
                cold_np, div_cold, acc, div_total, swap = _launch(
                    idx,
                    jax.random.fold_in(key, 7000 + 131 * rnd + rg),
                    jax.random.fold_in(key, 7100 + 131 * rnd + rg),
                    warm2,
                    hot,
                    f"remed_{rnd}_{rg}",
                    tau_init=cfg.SBC_REMEDIATE_TAU_INIT,
                )
                for gi, ds in enumerate(sub.tolist()):
                    samples_np[ds] = (
                        cold_np[gi].swapaxes(0, 1)
                        .reshape(C * per_chain, -1)[:post_samples]
                    )
                    rhat_np[ds], ess_np[ds] = _mixing_stats(cold_np[gi])
                    if div_cold is not None:
                        div_np[ds] = float(div_cold[gi])
                if swap is not None:
                    swap_accepts.append(swap)
                if verbose:
                    print(
                        f"[run_sbc] remediation round {rnd} group {rg + 1}: "
                        f"datasets {sub.tolist()} mean_accept={acc:.3f}",
                        flush=True,
                    )
            rounds.append({
                "round": rnd,
                "warmup": int(warm2),
                "beta_min": beta2,
                "datasets": [int(v) for v in todo],
                "rhat_after": [float(v) for v in rhat_np[todo]],
            })
        still = _flagged_idx()
        remediation = {
            "flagged": [int(v) for v in flagged0],
            "remediated": [int(v) for v in todo0],
            "warmup": int(warm1),
            "beta_min": beta1,
            "rhat_before": rhat_before,
            "rhat_after": [float(v) for v in rhat_np[todo0]],
            "still_flagged": [int(v) for v in still],
            "rounds": rounds,
        }
        if verbose:
            print(
                f"[run_sbc] remediation: {int(still.size)}/{D} datasets "
                f"still flagged after {len(rounds)} round(s)",
                flush=True,
            )

    thetas_true_np = np.asarray(theta_true)
    ranks = (samples_np < thetas_true_np[:, None, :]).sum(axis=1)
    if verbose:
        for i in range(D):
            print(f"[run_sbc] dataset {i + 1}/{D} ranks={ranks[i].tolist()}")

    np.save(outdir / "sbc_thetas_true.npy", thetas_true_np)
    np.save(outdir / "sbc_ranks.npy", ranks)
    # Full pooled posterior draws (D, S, dim): enables post-hoc analyses —
    # thinning/autocorrelation checks on the rank statistic, per-dataset
    # posterior inspection — without re-running the SBC (~1 MB at 96x600x5).
    np.save(outdir / "sbc_samples.npy", samples_np.astype(np.float32))
    np.savez(
        outdir / "sbc_mixing_diagnostics.npz",
        rhat_max=rhat_np,
        min_ess=ess_np,
        divergences=div_np,
        flagged_final=(
            _flagged_idx() if gate_active else np.asarray([], dtype=int)
        ),
    )
    if verbose:
        print(f"[run_sbc] wrote {outdir / 'sbc_thetas_true.npy'}")
        print(f"[run_sbc] wrote {outdir / 'sbc_ranks.npy'}")
        n_bad = int(np.sum(rhat_np > 1.05)) if rhat_np.size else 0
        print(
            f"[run_sbc] per-dataset mixing: max split-R-hat="
            f"{np.nanmax(rhat_np) if rhat_np.size else float('nan'):.3f}, "
            f"min ESS={np.nanmin(ess_np) if ess_np.size else float('nan'):.0f}, "
            f"{n_bad}/{D} datasets with R-hat > 1.05"
        )
    _plot_sbc_rank_histograms(ranks, post_samples, outdir)
    return {
        "thetas_true": thetas_true_np,
        "ranks": ranks,
        "all_samples": [samples_np[i] for i in range(D)],
        "rhat_max": rhat_np,
        "min_ess": ess_np,
        "divergences_per_dataset": div_np,
        "swap_accept": [s for s in swap_accepts if s is not None] or None,
        "remediation": remediation,
        "flagged_final": (
            [int(v) for v in _flagged_idx()] if gate_active else []
        ),
    }


def run_sbc(
    cfg: RunConfig,
    prior_theta: Distribution,
    density_estimator: MNLE,
    *,
    num_datasets: Optional[int] = None,
    num_posterior_samples: Optional[int] = None,
    outdir: str | Path = "mnle_outputs",
    seed: int | jax.Array = 0,
    verbose: bool = True,
    batched: bool = True,
    group_size: int = 8,
    mesh=None,
) -> dict:
    """Simulation-based calibration (reference mnle.py:132-237).

    For each dataset: theta_true ~ prior, simulate a session, run MCMC, rank
    theta_true among the posterior draws. Returns
    {"thetas_true", "ranks", "all_samples"} and writes
    sbc_thetas_true.npy / sbc_ranks.npy / sbc_rank_histograms.png with the
    reference's filenames (mnle.py:224-235).

    ``batched=True`` (default) folds the dataset axis into the chain axis and
    runs everything as one compiled program (see ``_run_sbc_batched``);
    ``batched=False`` keeps the reference's serial per-dataset loop.
    """
    num_datasets = int(num_datasets or cfg.SBC_NUM_DATASETS)
    post_samples = int(num_posterior_samples or cfg.SBC_POST_SAMPLES)
    sbc_cfg = cfg.replace(POSTERIOR_SAMPLES=post_samples)
    key = as_key(seed)
    outdir = Path(outdir)
    outdir.mkdir(parents=True, exist_ok=True)

    if batched and cfg.MCMC_METHOD in (
        "nuts", "nuts_pyro", "hmc", "slice", "slice_np_vectorized"
    ):
        return _run_sbc_batched(
            cfg,
            prior_theta,
            density_estimator,
            num_datasets,
            post_samples,
            outdir,
            key,
            verbose,
            group_size=group_size,
            mesh=mesh,
        )

    thetas_true, ranks, all_samples = [], [], []
    for i in range(num_datasets):
        k = jax.random.fold_in(key, i)
        theta_true = prior_theta.sample(jax.random.fold_in(k, 0), (1,))[0]
        x_o, pulses_o = simulate_session_data_rt_choice(
            theta_true,
            cfg.NUM_TRIALS_OBS,
            rng=jax.random.fold_in(k, 1),
            mu_sensory=cfg.MU_SENSORY,
            p_success=cfg.P_SUCCESS,
            return_pulse_sides=True,
        )
        x_o = pack_x_rt_choice(x_o, log_rt=cfg.LOG_RT_MANUALLY)
        samples = run_inference_mcmc(
            sbc_cfg,
            prior_theta,
            density_estimator,
            x_o,
            pulses_o,
            seed=jax.random.fold_in(k, 2),
            verbose=False,
        )
        r = _compute_ranks(np.asarray(samples), np.asarray(theta_true))
        thetas_true.append(np.asarray(theta_true))
        ranks.append(r)
        all_samples.append(np.asarray(samples))
        if verbose:
            print(f"[run_sbc] dataset {i + 1}/{num_datasets} ranks={r.tolist()}")

    thetas_true = np.stack(thetas_true)
    ranks = np.stack(ranks)
    np.save(outdir / "sbc_thetas_true.npy", thetas_true)
    np.save(outdir / "sbc_ranks.npy", ranks)
    if verbose:
        print(f"[run_sbc] wrote {outdir / 'sbc_thetas_true.npy'}")
        print(f"[run_sbc] wrote {outdir / 'sbc_ranks.npy'}")
    _plot_sbc_rank_histograms(ranks, post_samples, outdir)
    return {"thetas_true": thetas_true, "ranks": ranks, "all_samples": all_samples}
