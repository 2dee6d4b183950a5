"""Pallas TPU kernels for the hot non-matmul ops (SURVEY.md §2.16).

The reference delegates all heavy compute to prebuilt torch kernels; the TPU
analog of its "native layer" is XLA-fused convolutions plus these Pallas
kernels for the ops XLA schedules poorly:

* ``nms.py``    — whole greedy-NMS loop on-core (one kernel instead of one
  XLA dispatch per while-loop iteration);
* ``reorg.py``  — the darknet space-to-depth layout change;
* ``dwconv.py`` — depthwise 3×3 convolution for the MobileNet path (VPU
  shifted multiply-accumulate instead of XLA's generic grouped-conv path).

Every kernel has a pure-XLA fallback (ops/) and a parity test; selection is
config-gated (``[model] pallas``).
"""
