"""Fused postprocessing: per-class threshold + NMS, entirely on device.

The reference's eval/detect loop copies decoded tensors to host and runs
per-class threshold + greedy NMS in Python per image (reference
``utils/postprocess.py`` (recon), SURVEY.md §2.12, §3.2–3.3).  Here the same
per-class protocol is expressed as ``vmap(classes) ∘ vmap(batch)`` over the
static-shape NMS of ops/nms.py, so forward → decode → NMS compiles into one
XLA program; the host receives only the final packed (K per class) results.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .decode import Detections, decode
from .nms import nms_select

__all__ = ["PostProcessed", "postprocess", "postprocess_raw"]


class PostProcessed(NamedTuple):
    """Fixed-shape per-class detections. B=batch, C=classes, K=topk."""

    yx_min: jnp.ndarray  # (B, C, K, 2)
    yx_max: jnp.ndarray  # (B, C, K, 2)
    conf: jnp.ndarray    # (B, C, K) descending
    keep: jnp.ndarray    # (B, C, K) bool — survived threshold + NMS


@partial(jax.jit, static_argnames=("threshold", "overlap", "topk"))
def postprocess(det: Detections, threshold: float, overlap: float, topk: int) -> PostProcessed:
    """Per-class threshold + NMS on decoded detections.

    ``topk`` bounds emitted boxes per (image, class); the while-loop NMS
    exits early once every remaining score is below ``threshold``, so the
    bound costs nothing on well-trained models (few survivors per class).
    """

    def one_class(yx_min, yx_max, conf_c):
        idx, conf, valid = nms_select(yx_min, yx_max, conf_c, threshold, overlap, topk)
        return jnp.take(yx_min, idx, axis=0), jnp.take(yx_max, idx, axis=0), conf, valid

    def one_image(yx_min, yx_max, conf):
        # conf: (N, C) → per class (C, N)
        return jax.vmap(one_class, in_axes=(None, None, 1))(yx_min, yx_max, conf)

    ymin, ymax, scores, keep = jax.vmap(one_image)(det.yx_min, det.yx_max, det.conf)
    return PostProcessed(ymin, ymax, scores, keep)


def postprocess_raw(raw: jnp.ndarray, anchors: jnp.ndarray, threshold: float,
                    overlap: float, topk: int) -> PostProcessed:
    """decode + postprocess in one call (single fused program under jit)."""
    return postprocess(decode(raw, anchors), threshold, overlap, topk)
