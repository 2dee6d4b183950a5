"""Inference wrapper: backbone forward + decode (+ optional NMS), one program.

The reference exposes an ``Inference`` nn.Module wrapping the dnn so that
eval, detect and export all share one decode (reference
``model/__init__.py: Inference`` (recon), SURVEY.md §2.9).  Here it is a thin
functional wrapper that (a) folds BatchNorm into conv weights once, and
(b) jits forward → decode → postprocess into a single XLA program per input
size, so batched inference has zero host round-trips (BASELINE config 2).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.decode import Detections, decode
from ..ops.postprocess import PostProcessed, postprocess

__all__ = ["Inference"]


class Inference:
    """Shared forward+decode for eval/detect/export paths."""

    def __init__(self, model):
        self.model = model
        self.anchors = jnp.asarray(model.anchors)

    def fold(self, params, state):
        return self.model.fold(params, state)

    def __call__(self, folded, images) -> Detections:
        raw = self.model.apply_folded(folded, images)
        return decode(raw, self.anchors)

    def detect_fn(self, threshold: float, overlap: float, topk: int, mesh=None):
        """Build the fully-fused jitted (folded, images) → PostProcessed fn.

        Uses the Pallas NMS kernel when ``[model] pallas`` selects it and the
        backend is TPU; the XLA while-loop NMS otherwise.  With ``mesh``, the
        batch shards across the data axis (params replicated) — multi-chip
        batched inference, the eval analog of the sharded train step
        (BASELINE config 2 at scale).
        """
        import numpy as np

        from ..models import pallas_active

        use_fused = pallas_active("fusedpost", self.model.pallas)
        use_pallas = pallas_active("nms", self.model.pallas)
        anchors_np = np.asarray(self.anchors)

        def run(folded, images) -> PostProcessed:
            if use_fused:
                from ..kernels.nms import postprocess_fused_pallas

                raw = self.model.apply_folded(folded, images)
                return postprocess_fused_pallas(raw, anchors_np, threshold,
                                                overlap, topk)
            det = self(folded, images)
            if use_pallas:
                from ..kernels.nms import postprocess_pallas

                return postprocess_pallas(det, threshold, overlap, topk)
            return postprocess(det, threshold, overlap, topk)

        if mesh is None:
            return jax.jit(run)
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        return jax.jit(run, in_shardings=(repl, data), out_shardings=repl)

    def detect_fn_host(self, threshold: float, overlap: float, topk: int):
        """CPU-backend variant (BASELINE config 1: "CPU forward + NMS"):
        forward+decode jitted, NMS in the native C++ library (OpenMP across
        (image, class) problems) — faster on host than compiling the XLA
        greedy loop, same packed PostProcessed contract."""
        import numpy as np

        from ..native import nms_native_batch
        from ..ops.postprocess import PostProcessed

        fwd = jax.jit(self.__call__)

        def run(folded, images) -> PostProcessed:
            det = jax.device_get(fwd(folded, images))
            b, n, c = det.conf.shape
            boxes = np.concatenate([det.yx_min, det.yx_max], -1)    # (B,N,4)
            boxes = np.repeat(boxes[:, None], c, axis=1).reshape(b * c, n, 4)
            scores = np.moveaxis(det.conf, -1, 1).reshape(b * c, n)
            idx, conf, count = nms_native_batch(boxes, scores, threshold,
                                                overlap, topk)
            idx = idx.reshape(b, c, topk)
            take = lambda v: np.take_along_axis(
                np.repeat(v[:, None], c, axis=1), idx[..., None], axis=2)
            keep = np.arange(topk) < count.reshape(b, c)[..., None]
            return PostProcessed(take(det.yx_min), take(det.yx_max),
                                 conf.reshape(b, c, topk), keep)

        return run

    def train_forward(self, params, state, images):
        """Unfolded forward for the training loss (returns raw + new state)."""
        return self.model.apply(params, state, images, train=True)
