"""Pallas greedy-NMS kernel (BASELINE north_star: "a Pallas NMS kernel").

Same contract as ops/nms.py::nms_select — exact greedy NMS by argmax
iteration — but the loop runs inside Pallas kernels with candidates resident
in VMEM.  Structural differences from the XLA while-loop version:

* the Pallas grid is *sequential on a core*, so one (image, class) per
  program would serialize B·C tiny loops; instead each program processes a
  **block of L rows** (image,class pairs), with the argmax / pick / suppress
  step row-vectorized over sublanes — per-row early exit via an active mask,
  loop exits when the whole block is done;
* the XLA version's worst case couples ALL lanes (every lane iterates until
  the densest lane finishes); here the coupling is only within an L-row
  block, which keeps worst-case latency bounded (8× faster than XLA at
  saturated candidate density, measured on v5e);
* large blocks (default 32 rows) amortize the per-program fixed cost (DMA +
  dispatch ≈ 9 µs): the detect path at B=128, C=20 is 80 programs instead of
  the 2560 a row-per-program design would run. Per-class box broadcast is
  materialized in HBM — at 845 candidates it costs ~0.1 ms of bandwidth,
  far below the per-program overhead a shared-box kernel variant saves.

Per-pick loop body is reduction-minimal: the pick's score is the row max the
loop condition already computes, and the pick's area is recomputed from its
corners — 5 cross-lane reductions per iteration (max, argmax, 4 corner
picks), everything else elementwise.

Memory layout: candidates component-major (L, 4, Np), N padded to a lane
multiple with -inf scores; picks accumulate into lane-masked carry vectors
(Mosaic cannot store at dynamic lane offsets).
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
_ROWS = 64  # (image, class) rows per program — 8 f32 sublane tiles (v5e sweep:
            # 64 rows beat 8/16/32 by 1.5–3× and matched 128/256, both for
            # saturated and trained-model-sparse candidate densities)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _nms_loop(ymin, xmin, ymax, xmax, scores, *, threshold: float,
              overlap: float, max_out: int, mo: int):
    """Row-vectorized greedy loop over (L, Np) score rows.
    Returns (count (L,1), idx (L,mo), conf (L,mo))."""
    l, n = scores.shape
    area = jnp.maximum(ymax - ymin, 0.0) * jnp.maximum(xmax - xmin, 0.0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (l, n), 1)
    out_lane = jax.lax.broadcasted_iota(jnp.int32, (l, mo), 1)
    neg = jnp.float32(-jnp.inf)

    def cond(carry):
        k, s, m, _, _ = carry
        return jnp.any((m > threshold) & (k < max_out))

    def body(carry):
        k, s, m, idxv, confv = carry
        act = (m > threshold) & (k < max_out)                 # (L, 1)
        i = jnp.argmax(s, axis=1).astype(jnp.int32)[:, None]  # (L, 1)
        sel = lane == i                                       # (L, Np)
        pick = lambda v: jnp.sum(jnp.where(sel, v, 0.0), axis=1, keepdims=True)
        by0, bx0, by1, bx1 = pick(ymin), pick(xmin), pick(ymax), pick(xmax)
        barea = jnp.maximum(by1 - by0, 0.0) * jnp.maximum(bx1 - bx0, 0.0)
        iy = jnp.maximum(jnp.minimum(ymax, by1) - jnp.maximum(ymin, by0), 0.0)
        ix = jnp.maximum(jnp.minimum(xmax, bx1) - jnp.maximum(xmin, bx0), 0.0)
        inter = iy * ix
        iou = inter / jnp.maximum(area + barea - inter, 1e-10)
        write = act & (out_lane == k)                         # (L, mo)
        idxv = jnp.where(write, i, idxv)
        confv = jnp.where(write, m, confv)                    # pick's score == row max
        s = jnp.where(act & ((iou > overlap) | sel), neg, s)
        m = jnp.max(s, axis=1, keepdims=True)
        k = k + act.astype(jnp.int32)
        return k, s, m, idxv, confv

    m0 = jnp.max(scores, axis=1, keepdims=True)
    k, _, _, idxv, confv = jax.lax.while_loop(
        cond, body,
        (jnp.zeros((l, 1), jnp.int32), scores, m0,
         jnp.zeros((l, mo), jnp.int32), jnp.zeros((l, mo), jnp.float32)))
    return k, idxv, confv


def _nms_kernel(boxes_ref, scores_ref, idx_ref, conf_ref, count_ref,
                *, threshold: float, overlap: float, max_out: int):
    """Block of L rows with per-row boxes: boxes (L, 4, Np), scores (L, Np)."""
    k, idxv, confv = _nms_loop(
        boxes_ref[:, 0, :], boxes_ref[:, 1, :], boxes_ref[:, 2, :],
        boxes_ref[:, 3, :], scores_ref[...], threshold=threshold,
        overlap=overlap, max_out=max_out, mo=idx_ref.shape[1])
    idx_ref[...] = idxv
    conf_ref[...] = confv
    count_ref[...] = jnp.broadcast_to(k, count_ref.shape)


@functools.partial(jax.jit,
                   static_argnames=("threshold", "overlap", "max_out", "rows"))
def nms_select_pallas(yx_min, yx_max, scores, threshold: float, overlap: float,
                      max_out: int, rows: int = _ROWS):
    """Batched greedy NMS. yx_min/yx_max (..., N, 2), scores (..., N) →
    (idx, conf, valid) of shape (..., max_out) — same contract as
    ops.nms.nms_select, vectorized over leading dims by the kernel grid."""
    lead = scores.shape[:-1]
    n = scores.shape[-1]
    g = int(np.prod(lead)) if lead else 1
    rows = min(rows, _round_up(g, 8))
    np_pad = _round_up(n, _LANES)
    gp = _round_up(g, rows)

    boxes = jnp.concatenate([yx_min, yx_max], axis=-1)           # (..., N, 4)
    boxes = jnp.moveaxis(boxes.reshape(g, n, 4).astype(jnp.float32), -1, 1)
    boxes = jnp.pad(boxes, ((0, gp - g), (0, 0), (0, np_pad - n)))
    s = scores.reshape(g, n).astype(jnp.float32)
    s = jnp.pad(s, ((0, gp - g), (0, np_pad - n)), constant_values=-jnp.inf)

    kernel = functools.partial(_nms_kernel, threshold=threshold,
                               overlap=overlap, max_out=max_out)
    mo_pad = _round_up(max_out, _LANES)
    idx, conf, count = pl.pallas_call(
        kernel,
        grid=(gp // rows,),
        in_specs=[
            pl.BlockSpec((rows, 4, np_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, np_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((rows, mo_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, mo_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((gp, mo_pad), jnp.int32),
            jax.ShapeDtypeStruct((gp, mo_pad), jnp.float32),
            jax.ShapeDtypeStruct((gp, _LANES), jnp.int32),
        ],
    )(boxes, s)

    idx = idx[:g, :max_out].reshape(*lead, max_out)
    conf = conf[:g, :max_out].reshape(*lead, max_out)
    count = count[:g, 0].reshape(*lead)
    valid = jnp.arange(max_out) < count[..., None]
    return idx, conf, valid


def postprocess_pallas(det, threshold: float, overlap: float, topk: int,
                       rows: int = _ROWS):
    """Drop-in fused postprocess using the Pallas NMS kernel.

    det: ops.decode.Detections → ops.postprocess.PostProcessed.
    (image, class) rows are flattened and blocked ``rows`` per program; the
    per-class box broadcast is materialized (cheap in HBM bandwidth) so one
    generic kernel serves any block size.
    """
    from ..ops.postprocess import PostProcessed

    b, n, c = det.conf.shape
    yx_min = jnp.broadcast_to(det.yx_min[:, None], (b, c, n, 2))
    yx_max = jnp.broadcast_to(det.yx_max[:, None], (b, c, n, 2))
    scores = jnp.moveaxis(det.conf, -1, 1)                      # (B, C, N)
    idx, conf, valid = nms_select_pallas(
        yx_min, yx_max, scores, threshold, overlap, topk, rows=rows)
    out_min = jnp.take_along_axis(det.yx_min[:, None], idx[..., None], axis=2)
    out_max = jnp.take_along_axis(det.yx_max[:, None], idx[..., None], axis=2)
    return PostProcessed(out_min, out_max, conf, valid)
