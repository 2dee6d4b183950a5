"""Pure numerics: IoU, box decode, NMS, region loss, reorg.

Everything here is a pure function on arrays — jit/vmap/grad-safe, static
shapes, no Python data-dependent control flow — so the whole detection math
(including postprocessing) compiles into one XLA program on TPU.
"""

from .iou import area, intersection, iou_matrix, iou_pairwise  # noqa: F401
from .reorg import reorg  # noqa: F401
from .decode import decode  # noqa: F401
from .nms import nms_mask  # noqa: F401
