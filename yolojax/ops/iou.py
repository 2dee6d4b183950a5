"""IoU library in the repo-wide yx-corner convention (SURVEY.md §2.11).

Boxes are ``(yx_min, yx_max)`` corner pairs — arrays of shape ``(..., 2)``
holding (y, x).  The reference keeps dual numpy/torch implementations because
its k-means and cache tooling run on host while the loss runs on device
(reference ``utils/iou/`` (recon)); here a single jnp implementation serves
both (JAX runs it on CPU for host tooling and fuses it into the loss/NMS
programs on TPU), with a thin numpy mirror for pickling-time tools that must
not touch JAX.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["area", "intersection", "iou_matrix", "iou_pairwise", "np_iou_matrix", "wh_iou_matrix"]

_EPS = 1e-10


def area(yx_min, yx_max):
    """Box areas; negative extents clamp to zero. Shape (...,)."""
    hw = jnp.maximum(yx_max - yx_min, 0.0)
    return hw[..., 0] * hw[..., 1]


def intersection(yx_min1, yx_max1, yx_min2, yx_max2):
    """Pairwise intersection areas.

    ``yx_min1/yx_max1``: (..., N1, 2); ``yx_min2/yx_max2``: (..., N2, 2)
    → (..., N1, N2).
    """
    ymin = jnp.maximum(yx_min1[..., :, None, :], yx_min2[..., None, :, :])
    ymax = jnp.minimum(yx_max1[..., :, None, :], yx_max2[..., None, :, :])
    return area(ymin, ymax)


def iou_matrix(yx_min1, yx_max1, yx_min2, yx_max2):
    """Pairwise IoU matrix (..., N1, N2) — used by loss matching, NMS and AP."""
    inter = intersection(yx_min1, yx_max1, yx_min2, yx_max2)
    a1 = area(yx_min1, yx_max1)[..., :, None]
    a2 = area(yx_min2, yx_max2)[..., None, :]
    return inter / jnp.maximum(a1 + a2 - inter, _EPS)


def iou_pairwise(yx_min1, yx_max1, yx_min2, yx_max2):
    """Elementwise IoU of two aligned box sets, shape (...,)."""
    ymin = jnp.maximum(yx_min1, yx_min2)
    ymax = jnp.minimum(yx_max1, yx_max2)
    inter = area(ymin, ymax)
    union = area(yx_min1, yx_max1) + area(yx_min2, yx_max2) - inter
    return inter / jnp.maximum(union, _EPS)


def wh_iou_matrix(hw1, hw2):
    """Shape-only IoU of (h, w) pairs, both boxes centered at the origin.

    Used by best-anchor matching in the loss (SURVEY.md §2.10 step 1) and by
    the k-means "dimension clusters" tool (§2.18). (..., N1, 2) × (..., N2, 2)
    → (..., N1, N2).
    """
    inter = jnp.minimum(hw1[..., :, None, :], hw2[..., None, :, :])
    inter = inter[..., 0] * inter[..., 1]
    a1 = (hw1[..., 0] * hw1[..., 1])[..., :, None]
    a2 = (hw2[..., 0] * hw2[..., 1])[..., None, :]
    return inter / jnp.maximum(a1 + a2 - inter, _EPS)


# -- numpy mirror (host-only tooling: cache stats, AP accumulation) ----------

def np_iou_matrix(yx_min1, yx_max1, yx_min2, yx_max2):
    ymin = np.maximum(yx_min1[..., :, None, :], yx_min2[..., None, :, :])
    ymax = np.minimum(yx_max1[..., :, None, :], yx_max2[..., None, :, :])
    hw = np.maximum(ymax - ymin, 0.0)
    inter = hw[..., 0] * hw[..., 1]
    hw1 = np.maximum(yx_max1 - yx_min1, 0.0)
    hw2 = np.maximum(yx_max2 - yx_min2, 0.0)
    a1 = (hw1[..., 0] * hw1[..., 1])[..., :, None]
    a2 = (hw2[..., 0] * hw2[..., 1])[..., None, :]
    return inter / np.maximum(a1 + a2 - inter, _EPS)
