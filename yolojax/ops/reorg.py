"""Reorg / passthrough layer: space-to-depth with darknet channel ordering.

The reference implements reorg as a chain of torch view/permute ops
(reference ``model/yolo2.py: reorg`` (recon), SURVEY.md §2.6).  Its exact
semantics, derived from that permutation chain in NCHW, are::

    out[b, (p*s + q)*C + c, hi, wi] = in[b, c, hi*s + p, wi*s + q]

i.e. standard space_to_depth(block=s) but with the *block offset major,
channel minor* ordering (out channel = offset*C + c).  Getting this ordering
wrong is the classic silent porting bug (SURVEY.md §7 "hard parts") because
the concatenated passthrough features feed a conv whose darknet-imported
weights assume this exact layout.

Here we operate in NHWC (the TPU-native conv layout); the equivalent is a
reshape/transpose chain that XLA lowers to a pure layout change and fuses
with the adjacent concat — see kernels/reorg.py for the Pallas variant used
when fusion is not enough.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["reorg"]


def reorg(x: jnp.ndarray, stride: int = 2) -> jnp.ndarray:
    """Darknet-ordered space-to-depth on an NHWC tensor.

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
