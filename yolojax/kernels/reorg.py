"""Pallas reorg (darknet space-to-depth) kernel (BASELINE north_star: "the
reorg/passthrough layer as a Pallas layout kernel").

Contract identical to ops/reorg.py ``reorg_s2d``: NHWC (B,H,W,C) →
(B,H/s,W/s,s²C) with output channel ``(p*s + q)*C + c``.  (The engine only
selects this kernel when ``[model] reorg = s2d``; the default ``darknet``
order — see ops/reorg.py — stays on the XLA reshape/transpose chain.)
Grid: one program per (batch, output
row); each program reads the s source rows and emits one packed output row —
a pure VMEM layout shuffle with no compute, so HBM traffic is the exact
tensor size in and out.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["reorg_pallas"]


def _reorg_kernel(x_ref, out_ref, *, stride: int):
    # x_ref: (1, s, W, C) — the s input rows feeding one output row.
    # Written as s² strided copies (offset-major channel blocks): Mosaic
    # cannot infer layouts for the reshape/transpose formulation.
    _, s, w, c = x_ref.shape
    for p in range(s):
        for q in range(s):
            o = p * s + q
            out_ref[0, 0, :, o * c:(o + 1) * c] = x_ref[0, p, q::s, :]


@functools.partial(jax.jit, static_argnames=("stride",))
def reorg_pallas(x: jnp.ndarray, stride: int = 2) -> jnp.ndarray:
    b, h, w, c = x.shape
    s = stride
    if h % s or w % s:
        raise ValueError(f"reorg: spatial dims ({h}, {w}) not divisible by {s}")
    kernel = functools.partial(_reorg_kernel, stride=s)
    return pl.pallas_call(
        kernel,
        grid=(b, h // s),
        in_specs=[pl.BlockSpec((1, s, w, c), lambda bi, hi: (bi, hi, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, w // s, s * s * c),
                               lambda bi, hi: (bi, hi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h // s, w // s, s * s * c), x.dtype),
    )(x)
