"""Region head decode: raw conv output → normalized yx boxes + confidences.

Implements the YOLOv2 parameterization (paper eqns for bx, by, bw, bh —
PAPERS.md:9; reference ``model/__init__.py: Inference`` (recon), SURVEY.md
§2.9)::

    center_yx = (sigmoid(t_yx) + grid_offset_yx) / (H, W)     # normalized
    size_hw   = anchor_hw * exp(t_hw) / (H, W)
    iou       = sigmoid(t_o)                                   # objectness
    prob      = softmax(t_c) per anchor
    conf      = iou * prob
    yx_min    = center - size/2 ;  yx_max = center + size/2

Canonical channel layout (this framework's contract, enforced by the darknet
importer which permutes x/y and w/h rows at import time): the head emits NHWC
``(B, H, W, A*(5+C))`` with per-anchor channels ``[ty, tx, th, tw, to,
cls...]`` — yx-order everywhere, matching the repo convention.

Everything is vectorized jnp — under jit this fuses with the final conv and
(for eval) with threshold+NMS into one on-device program, eliminating the
reference's per-batch device→host sync (SURVEY.md §3.2).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["decode", "decode_flat", "Detections"]


class Detections(NamedTuple):
    """Decoded head output, flattened over cells×anchors (N = H*W*A)."""

    yx_min: jnp.ndarray  # (B, N, 2) normalized corners
    yx_max: jnp.ndarray  # (B, N, 2)
    iou: jnp.ndarray     # (B, N) objectness
    prob: jnp.ndarray    # (B, N, C) class probabilities
    conf: jnp.ndarray    # (B, N, C) = iou * prob


def _split_raw(raw: jnp.ndarray, num_anchors: int):
    """(B, H, W, A*(5+C)) → per-anchor fields, layout [ty,tx,th,tw,to,cls...]."""
    b, h, w, ch = raw.shape
    per = ch // num_anchors
    x = raw.reshape(b, h, w, num_anchors, per)
    return x[..., :2], x[..., 2:4], x[..., 4], x[..., 5:]


def decode(raw: jnp.ndarray, anchors: jnp.ndarray) -> Detections:
    """Decode raw head output against (A, 2) anchor (h, w) pairs in grid units."""
    b, h, w, _ = raw.shape
    a = anchors.shape[0]
    t_yx, t_hw, t_o, t_cls = _split_raw(raw.astype(jnp.float32), a)

    off_y = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    off_x = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    offset = jnp.stack([off_y, off_x], axis=-1)[None, :, :, None, :]  # (1,H,W,1,2)
    scale = jnp.asarray([h, w], dtype=jnp.float32)

    center = (jax.nn.sigmoid(t_yx) + offset) / scale
    # clamp the exp argument: early in training t_hw can wander far enough to
    # overflow f32 box areas and poison the loss's IoU terms with inf/nan
    size = anchors.astype(jnp.float32) * jnp.exp(jnp.clip(t_hw, -12.0, 12.0)) / scale
    half = size * 0.5
    yx_min = center - half
    yx_max = center + half

    iou = jax.nn.sigmoid(t_o)
    prob = jax.nn.softmax(t_cls, axis=-1)
    conf = iou[..., None] * prob

    n = h * w * a
    return Detections(
        yx_min=yx_min.reshape(b, n, 2),
        yx_max=yx_max.reshape(b, n, 2),
        iou=iou.reshape(b, n),
        prob=prob.reshape(b, n, -1),
        conf=conf.reshape(b, n, -1),
    )


def decode_flat(raw: jnp.ndarray, anchors: jnp.ndarray) -> jnp.ndarray:
    """Decode to a single packed (B, N, 5 + C) array [ymin,xmin,ymax,xmax,iou,conf...].

    Convenience for export paths that need one output tensor.
    """
    d = decode(raw, anchors)
    return jnp.concatenate([d.yx_min, d.yx_max, d.iou[..., None], d.conf], axis=-1)
