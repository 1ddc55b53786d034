"""NMS decoder training (stage 2 of the reference recipe).

Replaces ``Ldpc_128_training/training_stage.py`` + ``training_block``
(``ms_decoder_dense.py:289-357``) with a jitted optax loop.  The reference
trains on a fixed dataset of ``num_batches`` pre-generated TFRecord batches
re-iterated across epochs; here the same semantics come from a fixed ring of
PRNG keys (batch i of epoch e re-derives the identical frames), so no data
files are needed and everything stays on device.

Hyperparameters (``Ldpc_128_training/globalmap.py:41-45``): Adam, lr 0.01,
staircase decay 0.95 every 500 steps, per-tensor grad clip 5, termination at
min(total_steps, 1200)."""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..channel import ChannelSpec, sample_batch
from ..codes import Code
from ..ops import nms
from ..utils import checkpoint as ckpt_lib
from .optim import staircase_adam


@dataclasses.dataclass
class NMSTrainConfig:
    variant: str = "NMS-1"
    num_iterations: int = 12
    snr_lo: float = 2.7
    snr_hi: float = 2.7
    batch: int = 100
    num_batches: int = 1000  # distinct batches in the (virtual) dataset
    learning_rate: float = 0.01
    decay_steps: int = 500
    decay_rate: float = 0.95
    clip_norm: float = 5.0
    termination_step: int = 1200
    grad_accumulation: int = 1
    seed: int = 0
    all_zeros: bool = False
    print_interval: int = 50
    record_interval: int = 50


def _project_nonneg(params: dict, variant: str) -> dict:
    """NMS-r keeps its NN weights non-negative (keras ``non_neg`` constraint,
    ``ms_decoder_dense.py:16-17``) via projection after each update."""
    if variant != "NMS-r":
        return params
    out = dict(params)
    out["nn_w1"] = jnp.maximum(params["nn_w1"], 0.0)
    out["nn_w2"] = jnp.maximum(params["nn_w2"], 0.0)
    return out


def train_nms(
    code: Code,
    config: NMSTrainConfig,
    ckpt_dir: str | None = None,
    log_fn: Callable[[dict], None] | None = None,
) -> tuple[dict, dict]:
    """Train an NMS variant; returns (params, history summary)."""
    cfg = config
    variant = cfg.variant
    train_code = code.extended() if variant == "ENMS" else code
    h = jnp.asarray(train_code.h, jnp.float32)
    gen = jnp.asarray(code.g, jnp.float32)
    edge_cols = (
        jnp.asarray(nms.edge_columns(train_code.h)) if variant == "NMS-r" else None
    )
    spec = ChannelSpec.blend(cfg.snr_lo, cfg.snr_hi, code.rate)
    tx = staircase_adam(cfg.learning_rate, cfg.decay_steps, cfg.decay_rate, cfg.clip_norm)

    params = nms.init_params(variant, train_code.h, seed=cfg.seed)
    opt_state = tx.init(params)
    start_step = 0
    if ckpt_dir:
        restored = ckpt_lib.load(ckpt_dir)
        if restored is not None:
            start_step, blob, _ = restored
            params, opt_state = blob["params"], blob["opt_state"]
            start_step += 1

    data_key = jax.random.PRNGKey(cfg.seed)

    # codes above the VMEM kernels' envelope train through the edge-layout
    # XLA decoder (ops/nms_edge_xla): same update semantics and tie sets as
    # the dense path (linear incidence matmuls + identical argmin rules),
    # so gradients match to f32 reorder — see test_nms_edge_xla.py
    from ..ops.nms_edge_xla import auto_select as _edge_xla_auto

    _h_np = np.asarray(train_code.h)
    use_edge_xla = _edge_xla_auto(_h_np, variant)

    def loss_fn(p, llr, words):
        if use_edge_xla:
            from ..ops.nms_edge_xla import decode_edge_xla

            outs = decode_edge_xla(
                p, _h_np, llr, cfg.num_iterations, variant, mode="highest"
            )
        else:
            outs = nms.decode(
                p, h, llr, cfg.num_iterations, variant, edge_cols
            )
        loss = nms.multi_iteration_loss(outs, words)
        st = nms.frame_stats(outs[-1], words, h)
        fer = jnp.mean(st["frame_error"].astype(jnp.float32))
        ber = jnp.mean(st["bit_errors"].astype(jnp.float32)) / code.n
        return loss, (fer, ber)

    def one_step(carry, step_idx):
        p, opt_st = carry
        batch_id = step_idx % cfg.num_batches

        def accum(acc, micro):
            grads_sum, loss_sum, fer_sum, ber_sum = acc
            key = jax.random.fold_in(
                jax.random.fold_in(data_key, batch_id), micro
            )
            llr, words = sample_batch(key, spec, gen, cfg.batch, cfg.all_zeros)
            (loss, (fer, ber)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                p, llr, words
            )
            grads_sum = jax.tree.map(jnp.add, grads_sum, grads)
            return (grads_sum, loss_sum + loss, fer_sum + fer, ber_sum + ber), None

        zeros = jax.tree.map(jnp.zeros_like, p)
        (grads, loss, fer, ber), _ = jax.lax.scan(
            accum, (zeros, 0.0, 0.0, 0.0), jnp.arange(cfg.grad_accumulation)
        )
        mult = float(cfg.grad_accumulation)
        grads = jax.tree.map(lambda x: x / mult, grads)
        updates, opt_st = tx.update(grads, opt_st, p)
        p = optax.apply_updates(p, updates)
        p = _project_nonneg(p, variant)
        return (p, opt_st), (loss / mult, fer / mult, ber / mult)

    # steps run in print_interval-sized blocks inside ONE jitted scan: the
    # per-step host dispatch over the device tunnel (~25-45 ms) dominated
    # the training stages' wall time (r4; 1200 steps of microscopic decode
    # work took ~55 s), and logging/checkpointing only happens at block
    # boundaries anyway
    @functools.partial(jax.jit, static_argnames=("count",))
    def train_block(p, opt_st, step0, count):
        (p, opt_st), recs = jax.lax.scan(
            one_step, (p, opt_st), step0 + jnp.arange(count)
        )
        return p, opt_st, recs

    t0 = time.time()
    history = {"loss": [], "fer": [], "ber": []}
    end_step = cfg.termination_step
    block = max(1, cfg.print_interval)
    if variant == "NMS-r" and use_edge_xla:
        # measured on v5e: a 100-step fused scan of NMS-r grad-of-sort
        # programs on the (1056, 880) edge layout crashes the TPU worker
        # process (XLA backend fault, reproducible); 5-step blocks run
        # fine, so cap the block for this combination
        block = min(block, 5)
    step_idx = start_step
    while step_idx < end_step:
        count = min(block, end_step - step_idx)
        params, opt_state, (losses, fers, bers) = train_block(
            params, opt_state, jnp.asarray(step_idx), count
        )
        step_idx += count
        rec = {
            "step": step_idx,
            "loss": float(losses[-1]),
            "fer": float(fers[-1]),
            "ber": float(bers[-1]),
            "elapsed_s": time.time() - t0,
        }
        history["loss"].append(rec["loss"])
        history["fer"].append(rec["fer"])
        history["ber"].append(rec["ber"])
        if log_fn:
            log_fn(rec)
        if ckpt_dir:
            ckpt_lib.save(
                ckpt_dir,
                step_idx - 1,
                {"params": params, "opt_state": opt_state},
                extra={"variant": variant},
            )
    summary = {
        "steps": end_step,
        "final_loss": history["loss"][-1] if history["loss"] else None,
        "final_fer": history["fer"][-1] if history["fer"] else None,
        "params": jax.tree.map(lambda x: np.asarray(x).tolist(), params),
    }
    return params, summary
