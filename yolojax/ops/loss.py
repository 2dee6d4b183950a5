"""YOLOv2 region loss, fully vectorized with static shapes (SURVEY.md §2.10).

Semantics match the darknet region layer that the reference re-implements in
torch (reference ``model/__init__.py: Loss`` (recon)):

1. **Assignment** — each gt box goes to the grid cell of its center and, in
   that cell, to the anchor with max shape-only IoU (both centered at the
   origin).  Darknet processes gts sequentially so a later gt overwrites an
   earlier one landing on the same (cell, anchor); we reproduce that
   *last-wins* rule deterministically.
2. **Positive terms** (per matched anchor, all MSE): coordinates in transform
   space — ``(sigmoid(t_yx) − t̂_yx)²`` and ``(t_hw − log(gt_hw/anchor_hw))²``
   with darknet's ``(2 − gt_w·gt_h)`` small-box boost; objectness target =
   IoU(pred, gt) in "rescore" mode (else 1); class term reports the squared
   error of softmax probs vs one-hot while its *gradient* is darknet's delta
   ``prob − truth`` applied straight to the logits (region_layer's backward
   copies deltas without a softmax Jacobian — see ``LossConfig.class_grad``).
3. **Negative term** — anchors whose best IoU against *any* gt is below the
   ignore threshold (darknet 0.6) get objectness pushed to 0; anchors above
   the threshold but unassigned are ignored.
4. **Warmup term** — while seen-images < 12800 (darknet), unmatched boxes are
   pulled toward their anchor priors (center 0.5, log-size 0).

TPU-first design: instead of the reference's per-gt Python/scatter loop, the
assignment is materialized as a (G, H·W·A) one-hot matrix and targets are
scattered by a single matmul (MXU) — deterministic, differentiable where it
must be, and shape-static (gts padded to G with a validity mask).  Returns a
dict of named components so the train loop can weight and log each separately
(reference behavior, SURVEY.md §2.10).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .decode import decode
from .iou import iou_matrix, iou_pairwise, wh_iou_matrix

__all__ = ["region_loss", "LossConfig"]


class LossConfig(NamedTuple):
    """Static loss hyperparameters (from the ``[loss]`` config section)."""

    ignore_threshold: float = 0.6
    rescore: bool = True
    coord_boost: bool = True   # darknet's (2 - w*h) small-box scaling
    warmup_seen: int = 12800
    # Class-term gradient semantics (the VALUE is the squared error either way):
    #   "darknet" — the region layer's delta ``scale*(truth - prob)`` is written
    #     straight onto the logits (darknet's backward copies l.delta without a
    #     softmax Jacobian), so the effective gradient is the cross-entropy one,
    #     ``prob - truth``: O(1) at the uniform plateau.
    #   "mse" — true MSE backpropped through the softmax Jacobian: the
    #     true-class gradient is ~2·p_true·(1-p_true)² — O(1/C) at the uniform
    #     plateau and vanishing exactly where the true class is suppressed.
    #     Measurably untrainable at COCO's C=80 (cls flat at the uniform
    #     plateau for 6000 steps — see DEVNOTES round-5 session 11).
    class_grad: str = "darknet"


def _image_loss(raw, anchors, gt_yx_min, gt_yx_max, gt_cls, gt_valid, seen, cfg: LossConfig):
    """Loss component sums for one image. raw: (H, W, A*(5+C))."""
    h, w, ch = raw.shape
    a = anchors.shape[0]
    per = ch // a
    c = per - 5
    n = h * w * a
    g = gt_yx_min.shape[0]

    x = raw.astype(jnp.float32).reshape(h, w, a, per).reshape(n, per)
    sig_yx = jax.nn.sigmoid(x[:, :2])           # (N, 2)
    t_hw = x[:, 2:4]                            # (N, 2) raw log-space
    sig_o = jax.nn.sigmoid(x[:, 4])             # (N,)
    prob = jax.nn.softmax(x[:, 5:], axis=-1)    # (N, C)

    scale = jnp.asarray([h, w], dtype=jnp.float32)
    gt_center = (gt_yx_min + gt_yx_max) * 0.5 * scale        # grid units
    gt_hw = jnp.maximum((gt_yx_max - gt_yx_min), 0.0) * scale
    cell = jnp.clip(jnp.floor(gt_center), 0, scale - 1)      # (G, 2)

    # best anchor by shape-only IoU (darknet bias_match)
    anchor_idx = jnp.argmax(wh_iou_matrix(gt_hw, anchors.astype(jnp.float32)), axis=-1)  # (G,)
    flat_idx = ((cell[:, 0] * w + cell[:, 1]) * a + anchor_idx).astype(jnp.int32)        # (G,)

    # last-wins conflict resolution: a gt loses if any *later* valid gt maps
    # to the same slot (darknet's sequential overwrite, made deterministic)
    same = flat_idx[:, None] == flat_idx[None, :]
    later = jnp.triu(jnp.ones((g, g), dtype=bool), k=1)
    beaten = jnp.any(same & later & gt_valid[None, :], axis=1)
    winner = gt_valid & ~beaten                               # (G,)

    onehot = (flat_idx[:, None] == jnp.arange(n)[None, :]) & winner[:, None]
    onehot_f = onehot.astype(jnp.float32)                     # (G, N)
    positive = jnp.any(onehot, axis=0)                        # (N,)
    pos_f = positive.astype(jnp.float32)

    # per-gt targets in transform space
    tyx_target = gt_center - cell                             # target for sigmoid(t_yx)
    anchor_hw = anchors.astype(jnp.float32)[anchor_idx]       # (G, 2)
    thw_target = jnp.log(jnp.maximum(gt_hw, 1e-8) / anchor_hw)
    cls_target = jax.nn.one_hot(gt_cls, c)                    # (G, C)
    hw_norm = jnp.maximum(gt_yx_max - gt_yx_min, 0.0)
    boost = 2.0 - hw_norm[:, 0] * hw_norm[:, 1] if cfg.coord_boost else jnp.ones((g,))

    # decoded predictions (normalized), for rescore targets and the ignore band
    det = decode(raw[None], anchors)
    p_min, p_max = det.yx_min[0], det.yx_max[0]               # (N, 2)
    pred_at_gt_min = jnp.take(p_min, flat_idx, axis=0)
    pred_at_gt_max = jnp.take(p_max, flat_idx, axis=0)
    iou_target = jax.lax.stop_gradient(
        iou_pairwise(pred_at_gt_min, pred_at_gt_max, gt_yx_min, gt_yx_max))  # (G,)
    obj_target = iou_target if cfg.rescore else jnp.ones((g,))

    # scatter targets with one MXU matmul each: (N, G) @ (G, D).  precision
    # must be HIGHEST: the default bf16 matmul passes would quantize the
    # targets (each output element is exactly one v[g] since rows are one-hot)
    scatter = lambda v: jnp.einsum("gn,gd->nd", onehot_f, v,
                                   precision=jax.lax.Precision.HIGHEST,
                                   preferred_element_type=jnp.float32)
    tyx_t = scatter(tyx_target)                               # (N, 2)
    thw_t = scatter(thw_target)
    cls_t = scatter(cls_target)
    obj_t = scatter(obj_target[:, None])[:, 0]
    boost_t = scatter(boost[:, None])[:, 0]

    # positive terms
    coord = jnp.sum(pos_f * boost_t * (
        jnp.sum((sig_yx - tyx_t) ** 2, axis=-1) + jnp.sum((t_hw - thw_t) ** 2, axis=-1)))
    obj = jnp.sum(pos_f * (sig_o - obj_t) ** 2)
    if cfg.class_grad == "darknet":
        # darknet region-layer semantics: the reported cost is the squared
        # error of the softmax probs, but the delta applied to the logits is
        # ``prob - truth`` itself (no softmax Jacobian) — the cross-entropy
        # gradient.  Built with the straight-through surrogate: value from
        # the stop_gradient term, gradient from the logit·delta term.
        delta = jax.lax.stop_gradient(pos_f[:, None] * (prob - cls_t))  # (N, C)
        surrogate = jnp.sum(x[:, 5:] * delta)
        cls_loss = jnp.sum(delta ** 2) + surrogate - jax.lax.stop_gradient(surrogate)
    else:
        cls_loss = jnp.sum(pos_f[:, None] * (prob - cls_t) ** 2)

    # negatives: best IoU of each predicted box vs any valid gt < threshold
    full_iou = iou_matrix(p_min, p_max, gt_yx_min, gt_yx_max)  # (N, G)
    best_iou = jax.lax.stop_gradient(
        jnp.max(full_iou * gt_valid[None, :].astype(jnp.float32), axis=-1))
    noobj_mask = (best_iou < cfg.ignore_threshold) & ~positive
    noobj = jnp.sum(noobj_mask.astype(jnp.float32) * sig_o ** 2)

    # warmup prior-matching on unmatched anchors
    warm = (seen < cfg.warmup_seen).astype(jnp.float32)
    neg_f = 1.0 - pos_f
    prior = warm * jnp.sum(neg_f * (
        jnp.sum((sig_yx - 0.5) ** 2, axis=-1) + jnp.sum(t_hw ** 2, axis=-1)))

    return {"coord": coord, "object": obj, "noobject": noobj, "cls": cls_loss, "prior": prior}


@partial(jax.jit, static_argnames=("cfg",))
def region_loss(raw, anchors, gt_yx_min, gt_yx_max, gt_cls, gt_valid,
                seen=jnp.inf, cfg: LossConfig = LossConfig()):
    """Batched region loss → dict of per-component means over the batch.

    raw: (B, H, W, A*(5+C)); gt_*: (B, G, ...) padded with ``gt_valid`` mask;
    ``seen``: scalar count of images seen so far (drives the warmup term).
    The train loop combines components with the ``[loss]`` config weights and
    logs each separately.
    """
    seen = jnp.asarray(seen, dtype=jnp.float32)
    per_image = jax.vmap(_image_loss, in_axes=(0, None, 0, 0, 0, 0, None, None))(
        raw, anchors, gt_yx_min, gt_yx_max, gt_cls, gt_valid, seen, cfg)
    return {k: jnp.mean(v) for k, v in per_image.items()}
