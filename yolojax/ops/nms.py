"""On-device greedy NMS with static shapes (SURVEY.md §2.12, §7 "hard parts").

The reference runs an O(N²) greedy suppression per class on CPU after a
device→host copy each batch (reference ``utils/postprocess.py: nms`` (recon)).
Two exact on-device formulations here:

* :func:`nms_select` — the production path: an argmax-iteration
  ``lax.while_loop`` directly over all N decoded candidates.  Each round
  emits the highest remaining score and suppresses its neighbours with one
  O(N) IoU row; the loop exits as soon as the peak score falls below the
  confidence threshold or ``max_out`` boxes are emitted.  No sort, no top-k
  preselect, no K×K matrix — tiny XLA program, data-dependent early exit,
  identical results to sequential greedy NMS (a suppressed candidate can
  never become a later argmax).
* :func:`nms_mask` — a keep-mask formulation over a fixed candidate set
  (sort + fori_loop); used by tests and by consumers that need a mask
  aligned to the input order.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .iou import iou_matrix, iou_pairwise

__all__ = ["nms_select", "nms_mask", "nms_topk"]


def nms_select(yx_min: jnp.ndarray, yx_max: jnp.ndarray, scores: jnp.ndarray,
               threshold: float, overlap: float, max_out: int):
    """Greedy NMS over N candidates → top ``max_out`` picks, score order.

    Returns (idx, conf, valid): indices into the candidate axis, their
    scores, and a validity mask — all fixed shape (max_out,).
    """
    yx_min, yx_max = jnp.asarray(yx_min), jnp.asarray(yx_max)
    scores = jnp.asarray(scores)
    n = scores.shape[0]
    neg = jnp.float32(-jnp.inf)

    def cond(carry):
        k, s, _, _ = carry
        return (k < max_out) & (jnp.max(s) > threshold)

    def body(carry):
        k, s, oi, oc = carry
        i = jnp.argmax(s)
        bmin, bmax = yx_min[i], yx_max[i]
        iou = iou_pairwise(bmin[None, :], bmax[None, :], yx_min, yx_max)
        oi = oi.at[k].set(i.astype(jnp.int32))
        oc = oc.at[k].set(s[i])
        # suppress neighbours and always i itself (a degenerate zero-area
        # box has IoU 0 with everything, including itself)
        s = jnp.where((iou > overlap) | (jnp.arange(n) == i), neg, s)
        return k + 1, s, oi, oc

    k, _, idx, conf = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), scores.astype(jnp.float32),
         jnp.zeros((max_out,), jnp.int32), jnp.zeros((max_out,), jnp.float32)))
    valid = jnp.arange(max_out) < k
    return idx, conf, valid


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
