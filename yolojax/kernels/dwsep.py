"""Pallas fused depthwise-separable block (BASELINE config 5: "depthwise-
separable conv kernels via Pallas").

One kernel for the whole MobileNet block on the folded inference path:

    dw3×3(+bias, leaky) → pw1×1(+bias, leaky)

Where it matters: XLA's pair lowering is bandwidth-perfect at large spatial
sizes (208² measured exactly at the fused-traffic roofline on v5e) but falls
to 2–6× above the FUSED roofline from 104² down — where 11 of MobileNet's 13
blocks live. This kernel keeps the depthwise intermediate in VMEM (one HBM
read of x, one write of the pointwise output) and feeds the MXU directly.

Structure:

* spatial sizes ≤ ~104 fit whole padded images in VMEM, so blocks are
  **image-tiles, not row-tiles**: no halo overlap, which means plain
  BlockSpec blocking — Pallas auto-pipelines the HBM loads (double
  buffering) instead of the serial manual-DMA slabs a halo design needs;
* several images per program (VMEM permitting) so the pointwise matmul is a
  big (IB·Ho·Wo, C) @ (C, Cout) MXU op and the dw taps amortize their
  per-slice fixed cost;
* depthwise: 9 statically-shifted VPU FMAs, f32 accumulate;
* numerics match the XLA pair exactly: conv results round to the compute
  dtype BEFORE the f32 bias-add + leaky, as conv_apply does.

Stride-2 blocks deinterleave at value level (Mosaic has no bf16 strided
loads, DEVNOTES.md). The engine only routes blocks here when the input
spatial size is ≤ 104 (`models/engine.py`); larger blocks stay on XLA,
which is already at roofline there.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["dwsep_pallas"]


def _leaky(x, slope=0.1):
    return jnp.where(x >= 0, x, slope * x)


def _dwsep_kernel(x_ref, wd_ref, bd_ref, wp_ref, bp_ref, out_ref,
                  *, stride: int, ho: int, wo: int):
    ib, _, _, c = x_ref.shape
    cout = out_ref.shape[-1]

    # one slab-wide f32 conversion instead of 9 per-tap ones (the per-tap
    # astype costs a full VPU pass each — measured ~2× the whole dw phase)
    x32 = x_ref[...].astype(jnp.float32)
    if stride == 2:
        # deinterleave once at value level (no bf16 strided loads in Mosaic):
        # keep only even rows/cols; taps then index the compact (ho+2, wo+2)
        # neighborhood with a parity offset
        ph, pw_ = x32.shape[1], x32.shape[2]
        even = x32.reshape(ib, ph // 2, 2, pw_ // 2, 2, c)
        planes = [[even[:, :, py, :, px, :] for px in range(2)] for py in range(2)]

    # depthwise 3×3: 9 shifted FMAs, f32 accumulate (Mosaic unrolls the
    # leading image dim of the 4D slices)
    acc = jnp.zeros((ib, ho, wo, c), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            tap = wd_ref[dy, dx, :].astype(jnp.float32)
            if stride == 1:
                patch = x32[:, dy:dy + ho, dx:dx + wo, :]
            else:
                plane = planes[dy % 2][dx % 2]
                patch = plane[:, dy // 2:dy // 2 + ho, dx // 2:dx // 2 + wo, :]
            acc = acc + patch * tap
    # round to compute dtype before the f32 bias+leaky (parity with the
    # unfused conv_apply pair, whose conv emits the compute dtype)
    t = acc.astype(out_ref.dtype).astype(jnp.float32)
    t = _leaky(t + bd_ref[0].astype(jnp.float32)).astype(out_ref.dtype)

    # pointwise: (IB*Ho*Wo, C) @ (C, Cout) on the MXU
    z = jnp.dot(t.reshape(ib * ho * wo, c), wp_ref[...],
                preferred_element_type=jnp.float32)
    z = z.astype(out_ref.dtype).astype(jnp.float32)
    z = _leaky(z + bp_ref[0].astype(jnp.float32))
    out_ref[...] = z.reshape(ib, ho, wo, cout).astype(out_ref.dtype)


def _pick_image_block(b: int, per_image_bytes: int) -> int:
    """Images per program: biggest divisor of B keeping the estimated VMEM
    peak (double-buffered slabs + f32 slab copy + f32 accumulators +
    intermediates + double-buffered output) under the 16 MiB scoped limit
    with headroom."""
    for ib in (16, 8, 4, 2, 1):
        if b % ib:
            continue
        if ib * per_image_bytes <= 10 * 1024 * 1024:
            return ib
    return 1


@functools.partial(jax.jit, static_argnames=("stride",))
def dwsep_pallas(x: jnp.ndarray, wd: jnp.ndarray, bd: jnp.ndarray,
                 wp: jnp.ndarray, bp: jnp.ndarray, stride: int = 1) -> jnp.ndarray:
    """Fused depthwise-separable block, folded-inference form.

    x (B,H,W,C); wd (3,3,C) or HWIO (3,3,1,C); bd (C,); wp (C,Cout) or HWIO
    (1,1,C,Cout); bp (Cout,). Returns leaky(pw(leaky(dw(x)+bd))+bp), SAME
    padding k//2, darknet/torch symmetric (matches models.blocks._conv).
    """
    if wd.ndim == 4:
        wd = wd[:, :, 0, :]
    if wp.ndim == 4:
        wp = wp[0, 0]
    b, h, w, c = x.shape
    cout = wp.shape[-1]
    ho = (h - 1) // stride + 1
    wo = (w - 1) // stride + 1

    # symmetric 1-pad for the 3×3; width padded to a sublane multiple, plus
    # stride-2 slack so the kernel's (2·ho, 2·wo) full-window slices stay in
    # bounds when H or W is odd
    ph = max(h + 2, ho * stride + 2)
    pw_ = max(w + 2, wo * stride + 2)
    pw_ += (-pw_) % 8
    xp = jnp.pad(x, ((0, 0), (1, ph - h - 1), (1, pw_ - w - 1), (0, 0)))

    el = 2 if x.dtype == jnp.bfloat16 else 4
    slab = ph * pw_ * c
    hw = ho * wo
    per_image = (2 * slab * el + slab * 4          # 2 slab buffers + f32 copy
                 + hw * c * 4 + hw * c * el        # dw accumulator + t
                 + hw * cout * 4 + 2 * hw * cout * el)  # z f32 + 2 out buffers
    ib = _pick_image_block(b, per_image)

    kernel = functools.partial(_dwsep_kernel, stride=stride, ho=ho, wo=wo)
    return pl.pallas_call(
        kernel,
        grid=(b // ib,),
        in_specs=[
            pl.BlockSpec((ib, ph, pw_, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # dw taps (3, 3, C)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # dw bias (1, C)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # pw weights (C, Cout)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # pw bias (1, Cout)
        ],
        out_specs=pl.BlockSpec((ib, ho, wo, cout), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, ho, wo, cout), x.dtype),
    )(xp, wd, bd.reshape(1, -1), wp, bp.reshape(1, -1))
