"""On-device greedy NMS with static shapes (SURVEY.md §2.12, §7 "hard parts").

The reference runs an O(N²) greedy suppression per class on CPU after a
device→host copy each batch (reference ``utils/postprocess.py: nms`` (recon)).
Here NMS is a fixed-K masked iteration that jits into the same XLA program as
the forward pass and decode: candidates are pre-selected with ``lax.top_k``,
a K×K IoU matrix is built once (MXU/VPU-friendly), and greedy order is
resolved by a ``lax.fori_loop`` over rows — identical results to sequential
greedy NMS, zero host round-trips.  A Pallas kernel with the same contract
lives in kernels/nms.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .iou import iou_matrix

__all__ = ["nms_mask", "nms_topk"]


def nms_mask(yx_min: jnp.ndarray, yx_max: jnp.ndarray, scores: jnp.ndarray,
             overlap: float, valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Greedy NMS keep-mask over N boxes (N static).

    Boxes are suppressed by any *kept* higher-scoring box with IoU > overlap.
    ``valid`` masks out padding/below-threshold candidates. Returns bool (N,).
    Exactly matches sequential greedy NMS in descending score order.
    """
    yx_min, yx_max = jnp.asarray(yx_min), jnp.asarray(yx_max)
    scores = jnp.asarray(scores)
    n = scores.shape[0]
    valid = jnp.ones((n,), dtype=bool) if valid is None else jnp.asarray(valid)
    order = jnp.argsort(-scores)
    inv = jnp.argsort(order)
    ymin, ymax = yx_min[order], yx_max[order]
    v = valid[order]
    iou = iou_matrix(ymin, ymax, ymin, ymax)
    suppress = iou > overlap  # (N, N), symmetric

    def body(i, keep):
        # box i is kept iff valid and no kept earlier box suppresses it
        earlier = keep & (jnp.arange(n) < i)
        hit = jnp.any(earlier & suppress[:, i])
        return keep.at[i].set(v[i] & ~hit)

    keep = jax.lax.fori_loop(0, n, body, jnp.zeros((n,), dtype=bool))
    return keep[inv]


def nms_topk(yx_min: jnp.ndarray, yx_max: jnp.ndarray, scores: jnp.ndarray,
             threshold: float, overlap: float, topk: int):
    """Top-K preselect + greedy NMS; returns packed fixed-size results.

    (N,2),(N,2),(N,) → (yx_min, yx_max, scores, keep) each of leading dim K,
    sorted by descending score. ``keep`` is False for suppressed boxes and
    padding, so downstream consumers stay shape-static.
    """
    k = min(topk, scores.shape[0])
    top_scores, idx = jax.lax.top_k(scores, k)
    ymin = jnp.take(yx_min, idx, axis=0)
    ymax = jnp.take(yx_max, idx, axis=0)
    valid = top_scores > threshold
    keep = nms_mask(ymin, ymax, top_scores, overlap, valid)
    return ymin, ymax, top_scores, keep
