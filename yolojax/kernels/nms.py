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
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["nms_select_pallas", "postprocess_pallas", "postprocess_fused_pallas"]

_LANES = 128
_ROWS = 64  # (image, class) rows per program — 8 f32 sublane tiles (v5e sweep:
            # 64 rows beat 8/16/32 by 1.5–3× and matched 128/256, both for
            # saturated and trained-model-sparse candidate densities)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _nms_loop(ymin, xmin, ymax, xmax, scores, *, threshold: float,
              overlap: float, max_out: int, mo: int, with_boxes: bool = False):
    """Row-vectorized greedy loop over (L, Np) score rows.
    Returns (count (L,1), idx (L,mo), conf (L,mo)); with ``with_boxes`` also
    the picked corners (4 more (L,mo) arrays) — used by the fused kernel,
    whose caller has no decoded HBM box tensor to gather from afterwards."""
    l, n = scores.shape
    area = jnp.maximum(ymax - ymin, 0.0) * jnp.maximum(xmax - xmin, 0.0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (l, n), 1)
    out_lane = jax.lax.broadcasted_iota(jnp.int32, (l, mo), 1)
    neg = jnp.float32(-jnp.inf)
    nbox = 4 if with_boxes else 0

    def cond(carry):
        k, s, m = carry[:3]
        return jnp.any((m > threshold) & (k < max_out))

    def body(carry):
        k, s, m, idxv, confv, *boxv = carry
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
        if with_boxes:
            boxv = [jnp.where(write, b, v)
                    for b, v in zip((by0, bx0, by1, bx1), boxv)]
        s = jnp.where(act & ((iou > overlap) | sel), neg, s)
        m = jnp.max(s, axis=1, keepdims=True)
        k = k + act.astype(jnp.int32)
        return (k, s, m, idxv, confv, *boxv)

    m0 = jnp.max(scores, axis=1, keepdims=True)
    out = jax.lax.while_loop(
        cond, body,
        (jnp.zeros((l, 1), jnp.int32), scores, m0,
         jnp.zeros((l, mo), jnp.int32), jnp.zeros((l, mo), jnp.float32),
         *(jnp.zeros((l, mo), jnp.float32) for _ in range(nbox))))
    return (out[0], *out[3:])


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


# ---------------------------------------------------------------------------
# Fused decode + NMS (VERDICT round-1 #5): one kernel from the raw head
# output to picked boxes.  The (B, N, C) confidence tensor and the
# (B, C, N, 4) per-class box broadcast never exist in HBM — each program
# decodes its images' candidates in VMEM (exact ops/decode.py op order, so
# interpret-mode results are bit-identical to decode→postprocess) and feeds
# the same row-vectorized greedy loop as ``nms_select_pallas``.
# ---------------------------------------------------------------------------


def _fused_kernel(raw_ref, const_ref, idx_ref, conf_ref, count_ref,
                  y0_ref, x0_ref, y1_ref, x1_ref, *, ib: int, pp: int, c: int,
                  n: int, h: int, w: int, threshold: float, overlap: float,
                  max_out: int):
    """raw_ref: (ib*Pp, Np) component-major rows per image
    [ty, tx, th, tw, to, cls0..clsC-1, pad...]; const_ref: (8, Np) rows
    [off_y, off_x, anchor_h, anchor_w] in grid units."""
    np_ = raw_ref.shape[1]
    row = lambda r: raw_ref[r:r + 1, :]                       # (1, Np)
    cst = lambda r: const_ref[r:r + 1, :]
    lane_ok = jax.lax.broadcasted_iota(jnp.int32, (1, np_), 1) < n
    scale_y, scale_x = jnp.float32(h), jnp.float32(w)

    ymins, xmins, ymaxs, xmaxs, scores = [], [], [], [], []
    for i in range(ib):
        base = i * pp
        # boxes — op order matches ops/decode.py::decode exactly
        cy = (jax.nn.sigmoid(row(base + 0)) + cst(0)) / scale_y
        cx = (jax.nn.sigmoid(row(base + 1)) + cst(1)) / scale_x
        sh = cst(2) * jnp.exp(jnp.clip(row(base + 2), -12.0, 12.0)) / scale_y
        sw = cst(3) * jnp.exp(jnp.clip(row(base + 3), -12.0, 12.0)) / scale_x
        hh, hw = sh * 0.5, sw * 0.5
        ymin, ymax = cy - hh, cy + hh
        xmin, xmax = cx - hw, cx + hw
        obj = jax.nn.sigmoid(row(base + 4))
        # softmax over the C class-logit rows (jax.nn.softmax op order)
        mx = row(base + 5)
        for ci in range(1, c):
            mx = jnp.maximum(mx, row(base + 5 + ci))
        exps = [jnp.exp(row(base + 5 + ci) - mx) for ci in range(c)]
        denom = exps[0]
        for e in exps[1:]:
            denom = denom + e
        sc = jnp.concatenate([obj * (e / denom) for e in exps], axis=0)  # (C, Np)
        scores.append(jnp.where(lane_ok, sc, -jnp.inf))
        bcast = lambda v: jnp.broadcast_to(v, (c, np_))
        ymins.append(bcast(ymin)); xmins.append(bcast(xmin))
        ymaxs.append(bcast(ymax)); xmaxs.append(bcast(xmax))

    cat = lambda vs: jnp.concatenate(vs, axis=0)              # (ib*C, Np)
    k, idxv, confv, by0, bx0, by1, bx1 = _nms_loop(
        cat(ymins), cat(xmins), cat(ymaxs), cat(xmaxs), cat(scores),
        threshold=threshold, overlap=overlap, max_out=max_out,
        mo=idx_ref.shape[1], with_boxes=True)
    idx_ref[...] = idxv
    conf_ref[...] = confv
    count_ref[...] = jnp.broadcast_to(k, count_ref.shape)
    y0_ref[...] = by0; x0_ref[...] = bx0; y1_ref[...] = by1; x1_ref[...] = bx1


def postprocess_fused_pallas(raw, anchors, threshold: float, overlap: float,
                             topk: int):
    """raw (B, H, W, A*(5+C)) + anchors (A, 2) → PostProcessed, decode and
    per-class greedy NMS fused into one Pallas kernel.

    ``anchors`` must be concrete (numpy or closure constant under jit) — the
    per-candidate offset/anchor constant rows are precomputed host-side.

    Host/XLA-side prep is one cheap transpose to component-major
    (B, 5+C, N) — everything per-candidate (grid offsets, anchor sizes,
    sigmoid/exp/softmax, corner construction) happens in VMEM.  Each program
    covers ``ib`` images × C class rows, ib chosen so the row count is a
    sublane multiple near 128 (the measured sweet spot of the NMS loop).
    """
    from ..ops.postprocess import PostProcessed

    b, h, w, ch = raw.shape
    a = anchors.shape[0]
    per = ch // a
    c = per - 5
    n = h * w * a
    np_ = _round_up(n, _LANES)
    pp = _round_up(per, 8)

    base = 8 // math.gcd(c, 8)                    # min images per block
    ib = base * max(1, 128 // (base * c))         # target ~128 rows/block
    ib = min(ib, base * -(-b // base))            # don't pad far beyond B
    bp = _round_up(b, ib)
    l = ib * c

    # component-major: (B, N, per) → (B, per, N), pad, flatten sublanes
    raw32 = raw.astype(jnp.float32).reshape(b, n, per)
    rawT = jnp.transpose(raw32, (0, 2, 1))
    rawT = jnp.pad(rawT, ((0, bp - b), (0, pp - per), (0, np_ - n)))
    if bp > b:
        # zero logits would decode to objectness 0.5 and saturate the greedy
        # loop in the padded images' rows — push their scores below threshold
        rawT = rawT.at[b:, 4, :].set(-30.0)
    rawT = rawT.reshape(bp * pp, np_)

    # per-candidate constants in grid units, layout-matched to decode's
    # (H, W, A) flattening: n = (y*W + x)*A + anchor
    ai = np.arange(n)
    consts = np.zeros((8, np_), np.float32)
    consts[0, :n] = (ai // a) // w                # off_y
    consts[1, :n] = (ai // a) % w                 # off_x
    consts[2, :n] = np.asarray(anchors, np.float32)[ai % a, 0]
    consts[3, :n] = np.asarray(anchors, np.float32)[ai % a, 1]

    kernel = functools.partial(
        _fused_kernel, ib=ib, pp=pp, c=c, n=n, h=h, w=w,
        threshold=threshold, overlap=overlap, max_out=topk)
    mo_pad = _round_up(topk, _LANES)
    gp = bp * c
    out2 = lambda dt: jax.ShapeDtypeStruct((gp, mo_pad), dt)
    spec2 = pl.BlockSpec((l, mo_pad), lambda i: (i, 0), memory_space=pltpu.VMEM)
    idx, conf, count, y0, x0, y1, x1 = pl.pallas_call(
        kernel,
        grid=(bp // ib,),
        in_specs=[
            pl.BlockSpec((ib * pp, np_), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, np_), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[spec2, spec2,
                   pl.BlockSpec((l, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
                   spec2, spec2, spec2, spec2],
        out_shape=[out2(jnp.int32), out2(jnp.float32),
                   jax.ShapeDtypeStruct((gp, _LANES), jnp.int32),
                   out2(jnp.float32), out2(jnp.float32),
                   out2(jnp.float32), out2(jnp.float32)],
    )(rawT, jnp.asarray(consts))

    cut = lambda v: v.reshape(bp, c, mo_pad)[:b, :, :topk]
    conf = cut(conf)
    # count rows broadcast the scalar; take lane 0 of the count block
    count_bc = count.reshape(bp, c, _LANES)[:b, :, 0]
    valid = jnp.arange(topk) < count_bc[..., None]
    out_min = jnp.stack([cut(y0), cut(x0)], axis=-1)
    out_max = jnp.stack([cut(y1), cut(x1)], axis=-1)
    return PostProcessed(out_min, out_max, conf, valid)
