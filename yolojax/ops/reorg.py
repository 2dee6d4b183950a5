"""Reorg / passthrough layer (SURVEY.md §2.6 — "the classic porting bug").

Two distinct semantics exist in the wild, and they are NOT equivalent (not
even up to a channel permutation — verified against a literal transcription
of darknet's C code in tests/test_reorg_oracle.py):

* ``reorg_s2d`` — the *clean* space-to-depth most torch ports implement as a
  view/permute chain (reference ``model/yolo2.py: reorg`` (recon))::

      out[b, (p*s + q)*C + c, hi, wi] = in[b, c, hi*s + p, wi*s + q]

* ``reorg_darknet`` — what darknet's ``reorg_cpu`` (src/blas.c, called from
  ``forward_reorg_layer`` with ``forward=0`` and the layer's INPUT dims)
  actually computes.  The C code first *reinterprets* the input buffer
  (C, H, W) as (C/s², H·s, W·s), applies the offset-major space-to-depth to
  that view, then reinterprets the result (C, H, W) as (C·s², H/s, W/s).
  The composition scrambles channels *and* rows; YOLOv2's published weights
  were trained with it, so darknet ``.weights`` import parity requires this
  variant — the conv after the passthrough concat assumes this exact layout.

``[model] reorg = darknet|s2d`` selects the variant (default ``darknet``
for weight-import correctness).  Both are pure reshape/transpose chains that
XLA lowers to layout changes fused with the adjacent concat.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["reorg", "reorg_s2d", "reorg_darknet"]


def reorg_s2d(x: jnp.ndarray, stride: int = 2) -> jnp.ndarray:
    """Clean offset-major space-to-depth on an NHWC tensor.

    (B, H, W, C) → (B, H/s, W/s, s*s*C) with output channel index
    ``(p*s + q)*C + c`` for spatial offset (p, q) and input channel c.
    """
    b, h, w, c = x.shape
    s = stride
    if h % s or w % s:
        raise ValueError(f"reorg: spatial dims ({h}, {w}) not divisible by stride {s}")
    x = x.reshape(b, h // s, s, w // s, s, c)
    # (B, hi, p, wi, q, c) → (B, hi, wi, p, q, c): channel-minor, offset-major
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // s, w // s, s * s * c)


def reorg_darknet(x: jnp.ndarray, stride: int = 2) -> jnp.ndarray:
    """Darknet's true ``reorg_cpu`` semantics on an NHWC tensor.

    Equivalent formulation of the C loops (oracle-verified): on the
    CHW-major buffer, view (C, H, W) as (C/s², H·s, W·s), offset-major
    space-to-depth that view back to (C, H, W), then view as (C·s², H/s, W/s).
    Requires C divisible by s² (true for the YOLOv2 passthrough: 64, s=2).
    """
    b, h, w, c = x.shape
    s = stride
    if h % s or w % s:
        raise ValueError(f"reorg: spatial dims ({h}, {w}) not divisible by stride {s}")
    if c % (s * s):
        raise ValueError(f"darknet reorg: channels {c} not divisible by stride² {s*s}")
    oc = c // (s * s)
    t = x.transpose(0, 3, 1, 2)                # CHW-major buffer
    t = t.reshape(b, oc, h, s, w, s)           # view (oc, H·s, W·s): (c2, j, p, i, q)
    t = t.transpose(0, 3, 5, 1, 2, 4)          # (b, p, q, c2, j, i)
    t = t.reshape(b, c * s * s, h // s, w // s)  # output buffer reinterpretation
    return t.transpose(0, 2, 3, 1)             # back to NHWC


def reorg(x: jnp.ndarray, stride: int = 2, order: str = "darknet") -> jnp.ndarray:
    """Dispatch on the configured channel-order variant."""
    if order == "darknet":
        return reorg_darknet(x, stride)
    if order == "s2d":
        return reorg_s2d(x, stride)
    raise ValueError(f"unknown reorg order {order!r} (expected darknet|s2d)")
