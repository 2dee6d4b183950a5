"""Pallas greedy-NMS kernel (BASELINE north_star: "a Pallas NMS kernel").

Same contract as ops/nms.py::nms_select — exact greedy NMS by argmax
iteration — but the entire loop runs inside ONE kernel per (image, class)
with candidates resident in VMEM.  The XLA while_loop version dispatches a
kernel per iteration; on-core the loop body is a handful of VPU ops over the
lane-vectorized candidate arrays, so per-iteration overhead disappears.

Memory layout: candidates transposed to component-major (…, 4, N) so each
IoU row is elementwise over the 128-lane axis; N padded to a lane multiple
with -inf scores.  Grid: one program per (image, class) pair.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["nms_select_pallas", "postprocess_pallas"]

_LANES = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _nms_kernel(boxes_ref, scores_ref, idx_ref, conf_ref, count_ref,
                *, threshold: float, overlap: float, max_out: int):
    """One (image, class): boxes (1, 4, Np), scores (1, 1, Np) → (1, 1, max_out)."""
    ymin = boxes_ref[0, 0:1, :]
    xmin = boxes_ref[0, 1:2, :]
    ymax = boxes_ref[0, 2:3, :]
    xmax = boxes_ref[0, 3:4, :]
    area = jnp.maximum(ymax - ymin, 0.0) * jnp.maximum(xmax - xmin, 0.0)  # (1, Np)
    n = scores_ref.shape[2]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)

    def cond(carry):
        k, s = carry
        return (k < max_out) & (jnp.max(s) > threshold)

    def body(carry):
        k, s = carry
        i = jnp.argmax(s[0, :])
        sel = lane == i
        pick = lambda v: jnp.sum(jnp.where(sel, v, 0.0))  # scalar of lane i
        by0, bx0, by1, bx1 = pick(ymin), pick(xmin), pick(ymax), pick(xmax)
        barea = pick(area)
        iy = jnp.maximum(jnp.minimum(ymax, by1) - jnp.maximum(ymin, by0), 0.0)
        ix = jnp.maximum(jnp.minimum(xmax, bx1) - jnp.maximum(xmin, bx0), 0.0)
        inter = iy * ix
        iou = inter / jnp.maximum(area + barea - inter, 1e-10)
        idx_ref[0, 0, pl.ds(k, 1)] = i[None].astype(jnp.int32)
        conf_ref[0, 0, pl.ds(k, 1)] = jnp.sum(jnp.where(sel, s, 0.0))[None]
        s = jnp.where((iou > overlap) | sel, -jnp.inf, s)
        return k + 1, s

    idx_ref[...] = jnp.zeros_like(idx_ref)
    conf_ref[...] = jnp.zeros_like(conf_ref)
    k, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), scores_ref[0]))
    count_ref[0, 0, 0] = k


@functools.partial(jax.jit, static_argnames=("threshold", "overlap", "max_out"))
def nms_select_pallas(yx_min, yx_max, scores, threshold: float, overlap: float,
                      max_out: int):
    """Batched-greedy NMS. yx_min/yx_max (..., N, 2), scores (..., N) →
    (idx, conf, valid) of shape (..., max_out) — same contract as
    ops.nms.nms_select, vectorized over leading dims by the kernel grid."""
    lead = scores.shape[:-1]
    n = scores.shape[-1]
    g = int(np.prod(lead)) if lead else 1
    np_pad = _round_up(n, _LANES)

    boxes = jnp.concatenate([yx_min, yx_max], axis=-1)          # (..., N, 4)
    boxes = jnp.moveaxis(boxes.reshape(g, n, 4), -1, 1)          # (G, 4, N)
    boxes = jnp.pad(boxes, ((0, 0), (0, 0), (0, np_pad - n)))
    s = scores.reshape(g, 1, n).astype(jnp.float32)
    s = jnp.pad(s, ((0, 0), (0, 0), (0, np_pad - n)), constant_values=-jnp.inf)

    kernel = functools.partial(_nms_kernel, threshold=threshold,
                               overlap=overlap, max_out=max_out)
    mo_pad = _round_up(max_out, _LANES)
    idx, conf, count = pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, 4, np_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, np_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, mo_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, mo_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((g, 1, mo_pad), jnp.int32),
            jax.ShapeDtypeStruct((g, 1, mo_pad), jnp.float32),
            jax.ShapeDtypeStruct((g, 1, 1), jnp.int32),
        ],
    )(boxes, s)

    idx = idx[:, 0, :max_out].reshape(*lead, max_out)
    conf = conf[:, 0, :max_out].reshape(*lead, max_out)
    count = count[:, 0, 0].reshape(*lead)
    valid = jnp.arange(max_out) < count[..., None]
    return idx, conf, valid


def postprocess_pallas(det, threshold: float, overlap: float, topk: int):
    """Drop-in fused postprocess using the Pallas NMS kernel.

    det: ops.decode.Detections → ops.postprocess.PostProcessed.
    """
    from ..ops.postprocess import PostProcessed

    b, n, c = det.conf.shape
    conf = jnp.moveaxis(det.conf, -1, 1)                        # (B, C, N)
    ymin = jnp.broadcast_to(det.yx_min[:, None], (b, c, n, 2))
    ymax = jnp.broadcast_to(det.yx_max[:, None], (b, c, n, 2))
    idx, scores, valid = nms_select_pallas(ymin, ymax, conf, threshold, overlap, topk)
    out_min = jnp.take_along_axis(det.yx_min[:, None], idx[..., None], axis=2)
    out_max = jnp.take_along_axis(det.yx_max[:, None], idx[..., None], axis=2)
    return PostProcessed(out_min, out_max, scores, valid)
