"""Darknet-19 YOLOv2 and Tiny-Darknet backbones (SURVEY.md §2.6–2.7).

Architecture contract (reference ``model/yolo2.py: Darknet/Tiny`` (recon),
and the YOLO9000 paper's Darknet-19 + passthrough design, PAPERS.md:9):

* **Darknet** — the 19-conv trunk (3×3/1×1 alternation, 5 maxpools, stride
  32), detection head of three 3×3 1024-ch convs, with the passthrough: the
  26×26×512 stride-16 feature through a 1×1 64-ch conv then reorg (stride 2,
  darknet channel order) concatenated with the 13×13×1024 top feature before
  the last 3×3 conv and the linear 1×1 conv to A*(5+C) channels.
* **Tiny** — tiny-yolo-voc: 9 convs with maxpools (including the stride-1
  SAME pool after conv6), no passthrough.

Both are expressed as plans over fused conv+BN+leaky blocks (models/engine.py)
in NHWC/bfloat16; conv order in the plan equals the darknet ``.weights`` file
order, which is what the importer (tools/darknet.py) walks.
"""

from __future__ import annotations

from dataclasses import dataclass

from . import LayerDef, ModelBase
from .engine import fold_plan, init_plan, plan_convs, resolve_in_channels, run_plan

__all__ = ["Darknet", "Tiny"]


@dataclass
class _PlanModel(ModelBase):
    def __post_init__(self):
        self.plan = self._build_plan()
        resolve_in_channels(self.plan, 3)

    @property
    def layer_defs(self):
        return plan_convs(self.plan)

    @property
    def stride(self) -> int:
        return 32

    def init(self, rng):
        # jitted: eager per-layer init is ~50 dispatches — one program instead
        import jax

        return jax.jit(lambda r: init_plan(r, self.plan))(rng)

    def apply(self, params, state, images, train: bool = False):
        """images: (B, H, W, 3) in [0, 1] → raw head (B, H/32, W/32, A*(5+C))."""
        raw, new_state = run_plan(self.plan, params, state, images,
                                  bn=self.bn, train=train, compute_dtype=self.dtype,
                                  pallas=self.pallas, reorg_order=self.reorg_order)
        return raw, new_state

    def fold(self, params, state):
        import jax

        def _fold(p, s):
            folded = fold_plan(self.plan, p, s, self.bn)
            # weights stored in the compute dtype: halves the per-execution
            # HBM weight read for bf16 inference (biases stay f32 — they add
            # into the f32-promoted epilogue)
            return {name: {"w": lp["w"].astype(self.dtype), "b": lp["b"]}
                    for name, lp in folded.items()}

        return jax.jit(_fold)(params, state)

    def apply_folded(self, folded, images):
        raw, _ = run_plan(self.plan, folded, {}, images,
                          bn=self.bn, train=False, compute_dtype=self.dtype,
                          pallas=self.pallas, reorg_order=self.reorg_order)
        return raw


@dataclass
class Darknet(_PlanModel):
    """Darknet-19 YOLOv2 (the flagship model; BASELINE configs 1–4)."""

    def _build_plan(self):
        w = self.width
        c = lambda name, out, k, **kw: ("conv", LayerDef(name, w(name, out), k, **kw))
        pool = ("pool", 2, 2)
        return [
            c("c1", 32, 3), pool,
            c("c2", 64, 3), pool,
            c("c3", 128, 3), c("c4", 64, 1), c("c5", 128, 3), pool,
            c("c6", 256, 3), c("c7", 128, 1), c("c8", 256, 3), pool,
            c("c9", 512, 3), c("c10", 256, 1), c("c11", 512, 3),
            c("c12", 256, 1), c("c13", 512, 3),
            ("mark", "s16"), pool,
            c("c14", 1024, 3), c("c15", 512, 1), c("c16", 1024, 3),
            c("c17", 512, 1), c("c18", 1024, 3),
            # head (darknet cfg order: conv19, conv20, then route/conv21/reorg)
            c("c19", 1024, 3), c("c20", 1024, 3), ("mark", "top"),
            ("load", "s16"), c("c21", 64, 1), ("reorg", 2), ("concat", "top"),
            c("c22", 1024, 3),
            ("conv", LayerDef("out", self.out_channels, 1, bn=False, act=False)),
        ]


@dataclass
class Tiny(_PlanModel):
    """Tiny-Darknet (tiny-yolo-voc): 9 convs, no passthrough."""

    def _build_plan(self):
        w = self.width
        c = lambda name, out, k: ("conv", LayerDef(name, w(name, out), k))
        pool = ("pool", 2, 2)
        return [
            c("c1", 16, 3), pool,
            c("c2", 32, 3), pool,
            c("c3", 64, 3), pool,
            c("c4", 128, 3), pool,
            c("c5", 256, 3), pool,
            c("c6", 512, 3), ("pool", 2, 1),
            c("c7", 1024, 3), c("c8", 1024, 3),
            ("conv", LayerDef("out", self.out_channels, 1, bn=False, act=False)),
        ]
