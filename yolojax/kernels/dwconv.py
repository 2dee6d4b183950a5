"""Pallas depthwise 3×3 convolution (BASELINE config 5: "depthwise-separable
conv kernels via Pallas").

Depthwise convs do no channel mixing, so the MXU is useless for them — they
are pure VPU work: for each of the 9 taps, a shifted elementwise
multiply-accumulate over the (W, C) lane plane.  XLA lowers grouped convs
generically; this kernel states the computation directly.

Structure (halo rows overlap between row tiles, which BlockSpec cannot
express, so the input stays in HBM and each program DMAs its slab):

* grid = (batch, row-tiles, channel-tiles); channels are independent in a
  depthwise conv, so the channel axis blocks freely onto the 128-lane VPU;
* per program: async-copy the (rows·stride + 2, Wp, cb) input slab into VMEM
  scratch, then 9 statically-shifted FMAs accumulate in f32;
* SAME padding applied once by the wrapper; no boundary conditionals.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["dwconv3x3_pallas"]


def _dw_kernel(x_ref, w_ref, out_ref, scratch, sem, *, stride: int, rows: int,
               cb: int, c_blocks: int):
    bi = pl.program_id(0)
    hi = pl.program_id(1)
    slab_rows = rows * stride + 2
    r0 = hi * rows * stride
    if c_blocks == 1:
        # static channel slice: Mosaic cannot prove alignment of a dynamic
        # lane-dim offset unless it is a multiple of 128
        cslice = slice(None)
    else:
        cslice = pl.ds(pl.multiple_of(pl.program_id(2) * cb, 128), cb)
    dma = pltpu.make_async_copy(
        x_ref.at[bi, pl.ds(r0, slab_rows), :, cslice], scratch, sem)
    dma.start()
    dma.wait()

    wout = out_ref.shape[2]
    acc = jnp.zeros((rows, wout, cb), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            tap = w_ref[dy, dx, cslice].astype(jnp.float32)
            if stride == 1:
                patch = scratch[dy:dy + rows, dx:dx + wout, :]
            else:
                # Mosaic has no bf16 strided loads: load contiguous, then
                # deinterleave at value level
                full = scratch[dy:dy + rows * 2, dx:dx + wout * 2, :]
                patch = full.reshape(rows, 2, wout, 2, cb)[:, 0, :, 0, :]
            acc = acc + patch.astype(jnp.float32) * tap
    out_ref[0] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("stride", "row_tile"))
def dwconv3x3_pallas(x: jnp.ndarray, w: jnp.ndarray, stride: int = 1,
                     row_tile: int = 16) -> jnp.ndarray:
    """Depthwise 3×3 SAME conv. x (B,H,W,C), w (3,3,C) or HWIO (3,3,1,C)."""
    if w.ndim == 4:
        w = w[:, :, 0, :]
    b, h, wd, c = x.shape
    # darknet/torch symmetric padding (k//2 = 1 each side), matching _conv
    ho = (h - 1) // stride + 1
    wo = (wd - 1) // stride + 1
    pad_h = pad_w = 2
    top = left = 1

    rows = min(row_tile, ho)
    while ho % rows:
        rows -= 1
    cb = 128 if c % 128 == 0 else c
    grid = (b, ho // rows, c // cb)

    # pad height so the last slab's full (rows*stride + 2) read stays in
    # bounds, and width to a sublane multiple (Mosaic: DMA slices along the
    # second-to-last dim must be 8-aligned)
    extra_h = (ho // rows - 1) * rows * stride + rows * stride + 2 - (h + pad_h)
    width = wd + pad_w
    extra_w = (-width) % 8
    xp = jnp.pad(x, ((0, 0), (top, pad_h - top + max(extra_h, 0)),
                     (left, pad_w - left + extra_w), (0, 0)))
    wp_width = xp.shape[2]

    kernel = functools.partial(_dw_kernel, stride=stride, rows=rows, cb=cb,
                               c_blocks=c // cb)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # full padded input, HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # taps (3, 3, C)
        ],
        out_specs=pl.BlockSpec((1, rows, wo, cb),
                               lambda bi, hi, ci: (bi, hi, 0, ci),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, ho, wo, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((rows * stride + 2, wp_width, cb), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(xp, w)
