"""MobileNet-backbone YOLOv2 variant (SURVEY.md §2.8; BASELINE config 5).

The reference swaps a depthwise-separable MobileNet trunk in for Darknet-19
under the same region head, selected purely by changing ``[model] dnn``
(reference ``model/mobilenet.py`` (recon)).  Trunk: 3×3 stride-2 stem then 13
depthwise-separable blocks (3×3 depthwise + 1×1 pointwise, each conv+BN+leaky)
with strides giving an overall stride of 32.  The passthrough source is the
last stride-16 feature (512 ch), mirroring the Darknet head wiring.

Depthwise convs are expressed with ``feature_group_count == in_ch``; the
grouped-conv path has a dedicated Pallas kernel (kernels/dwconv.py) for when
XLA's depthwise lowering is not fast enough on TPU.
"""

from __future__ import annotations

from dataclasses import dataclass

from . import LayerDef
from .darknet import _PlanModel

__all__ = ["MobileNet"]

# (pointwise out channels, stride) for the 13 separable blocks
_BLOCKS = [(64, 1), (128, 2), (128, 1), (256, 2), (256, 1), (512, 2),
           (512, 1), (512, 1), (512, 1), (512, 1), (512, 1), (1024, 2), (1024, 1)]


@dataclass
class MobileNet(_PlanModel):
    def _build_plan(self):
        w = self.width
        plan = [("conv", LayerDef("stem", w("stem", 32), 3, stride=2))]
        for i, (out, stride) in enumerate(_BLOCKS, 1):
            # depthwise: groups=-1 resolves to in_ch in resolve_in_channels;
            # out_ch=-1 is a placeholder fixed to in_ch below
            plan.append(("conv", LayerDef(f"dw{i}", -1, 3, stride=stride, groups=-1)))
            plan.append(("conv", LayerDef(f"pw{i}", w(f"pw{i}", out), 1)))
        # depthwise out_ch == in_ch; resolve after widths are known
        self._fix_depthwise(plan)
        # passthrough from the last stride-16 feature (pw11, 512 ch)
        idx = next(i for i, op in enumerate(plan) if op[0] == "conv" and op[1].name == "pw11")
        plan.insert(idx + 1, ("mark", "s16"))
        head_w = lambda name, out: w(name, out)
        plan += [
            ("conv", LayerDef("c19", head_w("c19", 1024), 3)),
            ("conv", LayerDef("c20", head_w("c20", 1024), 3)), ("mark", "top"),
            ("load", "s16"), ("conv", LayerDef("c21", head_w("c21", 64), 1)),
            ("reorg", 2), ("concat", "top"),
            ("conv", LayerDef("c22", head_w("c22", 1024), 3)),
            ("conv", LayerDef("out", self.out_channels, 1, bn=False, act=False)),
        ]
        return plan

    @staticmethod
    def _fix_depthwise(plan):
        """Depthwise layers keep their input width: out_ch = running in_ch."""
        ch = None
        for op in plan:
            if op[0] != "conv":
                continue
            d = op[1]
            if d.out_ch == -1:
                d.out_ch = ch
            ch = d.out_ch
