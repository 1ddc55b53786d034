"""Decoding-path construction from MRB error-pattern statistics.

Stage-3 logic (``DL_Training_serial``):

* For each NMS failure, refine reliabilities (DIA), sort ascending by
  magnitude, run GE to find the MRB, and record the 6-segment error-weight
  pattern of the MRB vs the true codeword
  (``nn_training.py:518-575``) — here fully batched on device.
* Rank patterns by ratio-normalized frequency (count / prod C(seg_size, w)),
  keep ``sum(pattern) <= threshold_sum``, truncate to ``decoding_length``
  (``nn_training.py:461-471``, ``interval_boundary.py:108-147``).
"""

from __future__ import annotations

import collections
import json
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import gf2ops
from . import segments


def mrb_error_patterns(
    updated: jnp.ndarray, labels: jnp.ndarray, h: jnp.ndarray, k: int, num_segments: int = 6
):
    """Batched 6-segment MRB error-weight patterns.

    Returns (patterns, swap_len): patterns (B, num_segments) int32 per-segment
    error weights of the (ascending-sorted) MRB vs the labels; swap_len (B,).
    Mirrors ``stat_pro_osd`` + ``evaluate_MRB_pattern``
    (``nn_training.py:518-575``)."""
    boundaries = segments.segment_boundaries(k, num_segments)
    perm, h_p = gf2ops.reliability_sort(updated, h)
    info = gf2ops.identify_mrb(h_p, k)
    mrb_pos = info["index_order"][:, -k:]  # ascending reliability ranks
    full_perm = jnp.take_along_axis(perm, mrb_pos, axis=1)  # original positions
    mrb_inputs = jnp.take_along_axis(updated, full_perm, axis=1)
    mrb_labels = jnp.take_along_axis(labels.astype(jnp.int32), full_perm, axis=1)
    mrb_hard = (mrb_inputs <= 0).astype(jnp.int32)
    diff = (mrb_hard != mrb_labels).astype(jnp.int32)
    seg_matrix = np.zeros((k, num_segments), dtype=np.float32)
    for s in range(num_segments):
        seg_matrix[boundaries[s] : boundaries[s + 1], s] = 1.0
    patterns = (diff.astype(jnp.float32) @ jnp.asarray(seg_matrix)).astype(jnp.int32)
    return patterns, info["swap_len"]


class PatternCounter:
    """Host-side accumulator of order-pattern statistics (reference keeps a
    ``Counter`` keyed 'w1,...,w6')."""

    def __init__(self, k: int, num_segments: int = 6):
        self.k = k
        self.num_segments = num_segments
        self.sizes = segments.segment_sizes(k, num_segments)
        self.counts: collections.Counter = collections.Counter()
        self.total = 0
        self.swap_sum = 0

    def update(self, patterns: np.ndarray, swap_len: np.ndarray | None = None):
        for row in np.asarray(patterns):
            self.counts[tuple(int(x) for x in row)] += 1
        self.total += len(patterns)
        if swap_len is not None:
            self.swap_sum += int(np.sum(swap_len))

    def ratio_normalized(self) -> dict:
        """count / prod C(seg_size, w) per pattern (``nn_training.py:461-471``)."""
        out = {}
        for pattern, count in self.counts.items():
            size = np.prod(
                [math.comb(int(s), int(w)) for s, w in zip(self.sizes, pattern)]
            )
            out[pattern] = count / max(size, 1)
        return out

    def decoding_path(
        self, threshold_sum: int = 3, decoding_length: int = 30
    ) -> list[list[int]]:
        """Patterns ranked by ratio-normalized frequency desc, filtered to
        sum <= threshold_sum, truncated (``interval_boundary.py:108-147``)."""
        ranked = sorted(
            self.ratio_normalized().items(), key=lambda kv: kv[1], reverse=True
        )
        path = [list(p) for p, _ in ranked if sum(p) <= threshold_sum]
        return path[:decoding_length]

    def save(self, path: str):
        with open(path, "wt") as fh:
            json.dump(
                {
                    "k": self.k,
                    "num_segments": self.num_segments,
                    "total": self.total,
                    "swap_sum": self.swap_sum,
                    "counts": {",".join(map(str, k)): v for k, v in self.counts.items()},
                },
                fh,
            )

    @classmethod
    def load(cls, path: str) -> "PatternCounter":
        with open(path, "rt") as fh:
            blob = json.load(fh)
        pc = cls(blob["k"], blob["num_segments"])
        pc.total = blob["total"]
        pc.swap_sum = blob.get("swap_sum", 0)
        for key, val in blob["counts"].items():
            pc.counts[tuple(int(x) for x in key.split(","))] = val
        return pc


def mrb_bit_error_histogram(updated: jnp.ndarray, labels: jnp.ndarray, k: int):
    """Counter of MRB bit-error weights *before* GE (sorted-by-|value| tail),
    mirrors ``evaluate_MRB_bit`` (``nn_training.py:323-333``)."""
    order = jnp.argsort(jnp.abs(updated), axis=-1, stable=True)
    s_inputs = jnp.take_along_axis(updated, order, axis=1)
    s_labels = jnp.take_along_axis(labels.astype(jnp.int32), order, axis=1)
    hard = (s_inputs <= 0).astype(jnp.int32)
    errs = jnp.sum((hard[:, -k:] != s_labels[:, -k:]).astype(jnp.int32), axis=1)
    return collections.Counter(np.asarray(errs).tolist())
