"""DIA model training + order-pattern statistics sweep (stage 3, phase 1).

Replaces ``DL_Training_serial/nn_training.py:345-498``: train the selected
DIA refiner on NMS-failure trajectories with sigmoid CE (logits = -output),
then sweep the dataset collecting (a) MRB bit-error histograms before/after
DIA and (b) the ratio-normalized 6-segment order-pattern distribution that
defines the decoding path.

Hyperparameters (``DL_Training_serial/globalmap.py:39-43``): Adam lr 1e-3,
staircase decay 0.95/500, per-tensor clip 5e2, termination 2000 steps.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..codes import Code
from ..models import dia as dia_mod
from ..osd import path as path_mod
from ..utils import checkpoint as ckpt_lib
from .optim import staircase_adam


@dataclasses.dataclass
class DIATrainConfig:
    model: str = "model_cnn"  # model_cnn | model_rnn1 | model_rnn2
    batch: int = 100
    learning_rate: float = 1e-3
    decay_steps: int = 500
    decay_rate: float = 0.95
    clip_norm: float = 5e2
    termination_step: int = 2000
    epochs: int = 100
    seed: int = 0


def train_dia(
    code: Code,
    trajectories: np.ndarray,  # (N, T+1, n)
    labels: np.ndarray,  # (N, n)
    config: DIATrainConfig,
    ckpt_dir: str | None = None,
    log_fn: Callable[[dict], None] | None = None,
):
    """Returns (model, params, history)."""
    cfg = config
    model_name = dia_mod.canonical_dia_name(cfg.model)
    list_length = trajectories.shape[1]
    model = dia_mod.make_dia(model_name, code.n, list_length)
    rng = jax.random.PRNGKey(cfg.seed)
    sample = jnp.asarray(trajectories[: max(2, min(8, len(trajectories)))], jnp.float32)
    if model_name == "model_cnn":
        init_in = jnp.transpose(sample, (0, 2, 1)).reshape(-1, list_length, 1)
    else:
        init_in = sample
    params = model.init(rng, init_in)
    tx = staircase_adam(cfg.learning_rate, cfg.decay_steps, cfg.decay_rate, cfg.clip_norm)
    opt_state = tx.init(params)
    start_step = 0
    if ckpt_dir:
        restored = ckpt_lib.load(ckpt_dir)
        if restored is not None:
            start_step, blob, _ = restored
            params, opt_state = blob["params"], blob["opt_state"]
            # checkpoints store step == completed-step-count (saved after
            # `step += count`), so resume continues at exactly that index —
            # no +1 (nms_train saves step_idx - 1 and restores +1 instead)

    n_total = len(trajectories)
    num_batches = max(1, n_total // cfg.batch)
    eff_batch = min(cfg.batch, n_total)
    # dataset resident on device; steps run in 100-step blocks inside ONE
    # jitted scan (per-step dispatch over the device tunnel dominated this
    # stage's wall time — see nms_train.train_block).  The dataset is a
    # TRACED ARGUMENT, not a closure capture: a captured device array is
    # embedded in the executable as a constant (a 282 MB cache entry and a
    # ~10 min compile for the 20k-failure set, measured r4).
    traj_dev = jnp.asarray(trajectories, jnp.float32)
    labs_dev = jnp.asarray(labels, jnp.float32)

    import functools

    @functools.partial(jax.jit, static_argnames=("count",))
    def train_block(params, opt_state, traj_all, labs_all, step0, count):
        def one_step(carry, step_idx):
            params, opt_state = carry
            b = step_idx % num_batches
            traj = jax.lax.dynamic_slice_in_dim(
                traj_all, b * eff_batch, eff_batch
            )
            labs = jax.lax.dynamic_slice_in_dim(
                labs_all, b * eff_batch, eff_batch
            )

            def loss_fn(p):
                refined = model.refine(p, traj)
                return dia_mod.dia_loss(refined, labs)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            one_step, (params, opt_state), step0 + jnp.arange(count)
        )
        return params, opt_state, losses

    total = min(cfg.termination_step, cfg.epochs * num_batches)
    history = []
    step = start_step
    while step < total:
        count = min(100, total - step)
        params, opt_state, losses = train_block(
            params, opt_state, traj_dev, labs_dev, jnp.asarray(step), count
        )
        step += count
        rec = {"step": step, "loss": float(losses[-1])}
        history.append(rec)
        if log_fn:
            log_fn(rec)
        if ckpt_dir:
            ckpt_lib.save(
                ckpt_dir, step, {"params": params, "opt_state": opt_state}
            )
    if ckpt_dir:
        ckpt_lib.save(ckpt_dir, step, {"params": params, "opt_state": opt_state})
    return model, params, history


def pattern_statistics_sweep(
    code: Code,
    model,
    params,
    trajectories: np.ndarray,
    labels: np.ndarray,
    batch: int = 256,
    num_segments: int = 6,
):
    """Post-training sweep: refined reliabilities -> order-pattern counter +
    MRB bit-error histograms (initial / final-iteration / DIA-refined)."""
    import collections

    h = jnp.asarray(code.h_osd)  # full-rank basis for the OSD elimination
    counter = path_mod.PatternCounter(code.k, num_segments)
    hist_initial = collections.Counter()
    hist_final = collections.Counter()
    hist_refined = collections.Counter()

    @jax.jit
    def refine_and_stats(traj, labs):
        refined = model.refine(params, traj)
        patterns, swap_len = path_mod.mrb_error_patterns(
            refined, labs, h, code.k, num_segments
        )
        return refined, patterns, swap_len

    for lo in range(0, len(trajectories), batch):
        traj = jnp.asarray(trajectories[lo : lo + batch], jnp.float32)
        labs = jnp.asarray(labels[lo : lo + batch], jnp.int32)
        refined, patterns, swap_len = refine_and_stats(traj, labs)
        counter.update(np.asarray(patterns), np.asarray(swap_len))
        hist_initial.update(
            path_mod.mrb_bit_error_histogram(traj[:, 0], labs, code.k)
        )
        hist_final.update(
            path_mod.mrb_bit_error_histogram(traj[:, -1], labs, code.k)
        )
        hist_refined.update(path_mod.mrb_bit_error_histogram(refined, labs, code.k))
    return {
        "pattern_counter": counter,
        "hist_initial": hist_initial,
        "hist_final": hist_final,
        "hist_refined": hist_refined,
    }
