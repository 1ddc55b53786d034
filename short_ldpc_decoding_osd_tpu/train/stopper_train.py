"""Sliding-window stopper training (stage 3, phase 2).

Replaces ``DL_Training_serial/interval_boundary.py`` + ``predict_phase.py``:

1. sample generation: for every NMS failure, DIA-refine, run the batched OSD
   block-minima computation for the whole decoding path, locate the truth
   (success / failure / undetected) — ``query_teps_dis``
   (``interval_boundary.py:267-334``) without the per-frame Python loops;
2. window dataset: width-5 windows over the block minima; label 1 iff the
   window contains the global minimum AND the frame is decodable
   (``reform_inputs``, ``interval_boundary.py:224-249``);
3. training: class-weighted softmax CE with a x10 penalty on premature stops
   (``predict_phase.py:104-234``), Adam 1e-3, staircase 0.95/500, clip 5e2.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..codes import Code
from ..models import dia as dia_mod
from ..osd import engine, segments
from .optim import staircase_adam


@dataclasses.dataclass
class StopperTrainConfig:
    window: int = 5
    batch: int = 100
    learning_rate: float = 1e-3
    decay_steps: int = 500
    decay_rate: float = 0.95
    clip_norm: float = 5e2
    termination_step: int = 2000
    epochs: int = 100
    penalty: float = 10.0  # premature-stop penalty (regulation_weight)
    seed: int = 0


def generate_stopper_samples(
    code: Code,
    dia_model,
    dia_params,
    trajectories: np.ndarray,
    labels: np.ndarray,
    decoding_path: list[list[int]],
    batch: int = 128,
    num_segments: int = 6,
):
    """Per-failure block minima + truth phase.

    Returns (records, summary): records (M, P+1) float32 rows of block minima
    + phase (1 success, -1 failure); undetected frames are dropped (counted
    in summary), mirroring ``query_teps_dis``."""
    blocks, acc = segments.build_tep_blocks(decoding_path, code.k, num_segments)
    teps, mask, bounds = segments.pack_tep_chunks(blocks)
    teps_j, mask_j = jnp.asarray(teps), jnp.asarray(mask)
    h = jnp.asarray(code.h_osd)  # full-rank basis for the OSD elimination

    def build_block_mins(use_kernel):
        @jax.jit
        def block_mins(traj, labs):
            refined = dia_model.refine(dia_params, traj)
            prep = engine.prepare(refined, traj[:, 0], labs, h, code.k)
            minima, _ = engine.block_discrepancy_minima(
                prep, teps_j, mask_j, code.k, bounds=bounds,
                use_kernel=use_kernel,
            )
            return minima, prep.truth_discrepancy

        return block_mins

    # host-level fused-kernel guard, same policy as engine.make_dl_osd_step
    # (a Mosaic lowering/VMEM failure surfaces at outer-jit compile)
    state = {"fn": build_block_mins(None), "demoted": False}

    def block_mins(traj, labs):
        if not state["demoted"]:
            from ..mc.harness import _attempt_fused

            status, val = _attempt_fused(
                lambda: state["fn"](traj, labs), "stopper-sample block minima"
            )
            if status == "ok":
                return val
            state["demoted"] = True
            state["fn"] = build_block_mins(False)
        return state["fn"](traj, labs)

    rec_list = []
    success = fails = undetected = 0
    for lo in range(0, len(trajectories), batch):
        traj = jnp.asarray(trajectories[lo : lo + batch], jnp.float32)
        labs = jnp.asarray(labels[lo : lo + batch], jnp.int32)
        minima, truth = block_mins(traj, labs)
        minima = np.asarray(minima)
        truth = np.asarray(truth)
        overall = minima.min(axis=1)
        scale = np.maximum(np.abs(truth), 1.0)
        is_undetected = overall < truth - 1e-3 * scale
        is_success = np.abs(overall - truth) <= 1e-3 * scale
        phase = np.where(is_success, 1.0, -1.0)
        keep = ~is_undetected
        undetected += int(is_undetected.sum())
        success += int((is_success & keep).sum())
        fails += int((~is_success & keep).sum())
        rec = np.concatenate([minima[keep], phase[keep][:, None]], axis=1)
        rec_list.append(rec.astype(np.float32))
    records = (
        np.concatenate(rec_list)
        if rec_list
        else np.zeros((0, len(blocks) + 1), np.float32)
    )
    summary = {
        "success": success,
        "fail": fails,
        "undetected": undetected,
        "path_len": len(blocks),
        "acc_block_sizes": acc.tolist(),
    }
    return records, summary


def reform_windows(records: np.ndarray, window: int = 5):
    """Window dataset from block-minima records (``reform_inputs``).

    Returns (inputs (M', window+1), labels (M',)): sorted window values +
    position index; label 1 iff window holds the global min and phase==1."""
    if not len(records):
        return np.zeros((0, window + 1), np.float32), np.zeros((0,), np.float32)
    minima = records[:, :-1]
    phase = records[:, -1:]
    decodable = (phase != -1).astype(np.float32)
    global_min = minima.min(axis=1, keepdims=True)
    ins, labs = [], []
    for i in range(minima.shape[1] - window + 1):
        win = minima[:, i : i + window]
        win_min = win.min(axis=1, keepdims=True)
        label = ((global_min == win_min).astype(np.float32) * decodable)[:, 0]
        feats = np.concatenate(
            [np.sort(win, axis=1), np.full((len(win), 1), float(i))], axis=1
        )
        ins.append(feats)
        labs.append(label)
    return (
        np.concatenate(ins).astype(np.float32),
        np.concatenate(labs).astype(np.float32),
    )


def stopper_loss(probs, one_hot, weights, penalty):
    """Class-weighted CE with premature-stop penalty
    (``predict_phase.py:123-135``)."""
    probs = jnp.maximum(probs, 1e-30)
    ce = -jnp.sum(jnp.log(probs) * one_hot, axis=-1)
    predicted_stop = probs[:, 0] < probs[:, 1]
    should_continue = one_hot[:, 0] == 1.0
    pen = jnp.where(
        jnp.logical_and(predicted_stop, should_continue), penalty, 1.0
    )
    return jnp.sum(ce * pen * weights)


def train_stopper(
    inputs: np.ndarray,
    labels: np.ndarray,
    config: StopperTrainConfig,
    seed: int = 0,
):
    """Returns (model, params, validation dict)."""
    cfg = config
    model = dia_mod.StopperFcn(cfg.window + 1)
    rng = np.random.default_rng(seed)
    perm = rng.permutation(len(inputs))
    inputs, labels = inputs[perm], labels[perm]
    counts = np.bincount(labels.astype(int), minlength=2).astype(np.float64)
    class_w = len(labels) / (2.0 * np.maximum(counts, 1))
    weights = class_w[labels.astype(int)].astype(np.float32)
    one_hot = np.eye(2, dtype=np.float32)[labels.astype(int)]

    params = model.init(jax.random.PRNGKey(cfg.seed), jnp.zeros((2, cfg.window + 1)))
    tx = staircase_adam(cfg.learning_rate, cfg.decay_steps, cfg.decay_rate, cfg.clip_norm)
    opt_state = tx.init(params)

    n = len(inputs)
    nb = max(1, n // cfg.batch)
    eff_batch = min(cfg.batch, n)

    # dataset resident on device as TRACED ARGUMENTS (closure-captured device
    # arrays embed in the executable as constants — see dia_train); ALL steps
    # run inside one jitted scan (the tiny (batch, window+1) matmuls are pure
    # dispatch overhead otherwise)
    def run_all(params, opt_state, x_all, oh_all, w_all, steps):
        def one_step(carry, step_idx):
            params, opt_state = carry
            b = step_idx % nb
            x = jax.lax.dynamic_slice_in_dim(x_all, b * eff_batch, eff_batch)
            oh = jax.lax.dynamic_slice_in_dim(oh_all, b * eff_batch, eff_batch)
            w = jax.lax.dynamic_slice_in_dim(w_all, b * eff_batch, eff_batch)

            def loss_fn(p):
                probs = model.apply(p, x)
                # L2 regularization on the first layer (reference
                # kernel_regularizer)
                reg = 0.01 * jnp.sum(
                    jnp.square(p["params"]["dense1"]["kernel"])
                )
                return stopper_loss(probs, oh, w, cfg.penalty) + reg

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state), loss

        return jax.lax.scan(one_step, (params, opt_state), steps)

    total = min(cfg.termination_step, cfg.epochs * nb)
    (params, opt_state), losses = jax.jit(run_all)(
        params, opt_state, jnp.asarray(inputs), jnp.asarray(one_hot),
        jnp.asarray(weights), jnp.arange(total),
    )
    loss = losses[-1] if total else jnp.float32(0.0)

    # validation: S / F1 (late stop) / F2 (premature stop)
    probs = np.asarray(model.apply(params, jnp.asarray(inputs)))
    pred = probs.argmax(axis=1)
    truth = labels.astype(int)
    validation = {
        "success": int((pred == truth).sum()),
        "late": int((truth > pred).sum()),
        "premature": int((truth < pred).sum()),
        "total": int(n),
        "final_loss": float(loss) if n else 0.0,
    }
    return model, params, validation
