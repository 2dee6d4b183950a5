"""Pallas 2×2/2 max-pool (NHWC) — streaming, memory-bound.

Motivation (DEVNOTES.md): XLA's ``reduce_window`` runs the mid-stack pools of
Darknet-19 far below their memory bound on v5e (pool3 (128,104,104,128)
measured 2.2 ms vs 0.54 ideal, ≈24 %); the reshape-max and slice-max XLA
variants are no better.  This kernel streams row-pair blocks through VMEM and
reduces with two elementwise maxes: the H-pair reduction indexes the *outer*
block dim (plain address arithmetic), and the W-pair reduction splits the
sublane dim by static reshape — no strided sublane loads, so bf16 is safe
(Mosaic rejects bf16 strided loads, DEVNOTES.md).

Inference-path only (reduce_window's autodiff needs the -inf init; training
keeps the XLA op).  Selected by the ``[model] pallas`` token ``pool``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["maxpool2x2_pallas"]


def _pool_kernel(x_ref, o_ref):
    x = x_ref[0]                      # (2*hb, W, C)
    h2, w, c = x.shape
    # step-2 strided slices lower to (unsupported) gathers in Mosaic; split
    # the dims by static reshape and index the pair axis instead
    x = x.reshape(h2 // 2, 2, w, c)
    m = jnp.maximum(x[:, 0], x[:, 1])          # (hb, W, C)
    m = m.reshape(h2 // 2, w // 2, 2, c)
    o_ref[0] = jnp.maximum(m[:, :, 0, :], m[:, :, 1, :])


@functools.partial(jax.jit, static_argnames=("block_rows",))
def maxpool2x2_pallas(x, block_rows: int = 16):
    """x (B, H, W, C) with H, W even → (B, H/2, W/2, C), max over 2×2/2.

    ``block_rows`` = output rows per grid step (input rows = 2×).  Blocks
    pipeline over (batch, row-block); W and C stay whole so the only
    in-kernel layout ops are an outer-dim stride and one sublane split.
    """
    b, h, w, c = x.shape
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    hb = block_rows
    while (h // 2) % hb:
        hb //= 2
    return pl.pallas_call(
        _pool_kernel,
        grid=(b, h // 2 // hb),
        in_specs=[pl.BlockSpec((1, 2 * hb, w, c), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, hb, w // 2, c), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h // 2, w // 2, c), x.dtype),
    )(x)
