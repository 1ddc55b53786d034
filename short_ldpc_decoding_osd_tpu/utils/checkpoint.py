"""Tiny checkpoint store for parameter pytrees + Monte-Carlo resume state.

The models here are tiny (1-3 scalars for NMS, O(10k) params for DIA), so a
pickle of numpy-ified pytrees with a step counter is all that is needed
(SURVEY.md §5 checkpoint/resume row).  Keeps the reference's
``max_to_keep``-style rotation and a ``latest`` resolver."""

from __future__ import annotations

import os
import pickle
import re

import jax
import numpy as np

_FMT = "ckpt-{step}.pkl"
_PAT = re.compile(r"ckpt-(\d+)\.pkl$")


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save(ckpt_dir: str, step: int, tree, extra: dict | None = None, keep: int = 5):
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, _FMT.format(step=step))
    with open(path, "wb") as fh:
        pickle.dump({"step": step, "tree": _to_host(tree), "extra": extra or {}}, fh)
    steps = sorted(list_steps(ckpt_dir))
    for old in steps[:-keep]:
        os.remove(os.path.join(ckpt_dir, _FMT.format(step=old)))
    return path


def list_steps(ckpt_dir: str) -> list[int]:
    if not os.path.isdir(ckpt_dir):
        return []
    out = []
    for name in os.listdir(ckpt_dir):
        match = _PAT.match(name)
        if match:
            out.append(int(match.group(1)))
    return sorted(out)


def load(ckpt_dir: str, step: int | str = "latest"):
    """Returns (step, tree, extra) or None if nothing stored."""
    steps = list_steps(ckpt_dir)
    if not steps:
        return None
    chosen = steps[-1] if step == "latest" else int(step)
    with open(os.path.join(ckpt_dir, _FMT.format(step=chosen)), "rb") as fh:
        blob = pickle.load(fh)
    return blob["step"], blob["tree"], blob["extra"]
