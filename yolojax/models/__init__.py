"""Model zoo: config-driven backbones + region head (SURVEY.md §2.6–2.9).

The backbone class is selected by the ``[model] dnn`` dotted path in the ini
(reference behavior: the config *is* the model spec).  Every model follows one
functional protocol:

* ``init(rng) -> (params, state)`` — f32 parameter/state pytrees keyed by
  layer name;
* ``apply(params, state, images, train) -> (raw, new_state)`` — full training
  forward to the raw head tensor (B, H, W, A*(5+C)), NHWC, bfloat16 compute;
* ``fold(params, state) -> folded`` + ``apply_folded(folded, images)`` — the
  inference path with BatchNorm folded into conv weights (one fused
  conv+bias+leaky per block);
* ``layer_defs`` — the ordered layer table that drives the darknet ``.weights``
  importer/exporter and the channel-pruning tool.

Channel widths flow through :class:`ChannelResolver` — the analog of the
reference's ``ConfigChannels`` (reference ``model/__init__.py`` (recon),
SURVEY.md §2.19) — so pruned models rebuild from the same class definitions
with per-layer width overrides.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

from ..config import parse_attr
from .blocks import BNConfig

__all__ = ["ChannelResolver", "LayerDef", "ModelBase", "build_model"]


class ChannelResolver:
    """Per-layer output-channel resolution with pruning overrides.

    Reads a JSON mapping {layer_name: channels} from ``[model] channels``
    (written by tools/prune.py); unlisted layers keep their default width.
    """

    def __init__(self, overrides: dict[str, int] | None = None):
        self.overrides = dict(overrides or {})

    @classmethod
    def from_config(cls, config):
        path = config.get("model", "channels", fallback="").strip() if config else ""
        if not path:
            return cls()
        with open(os.path.expanduser(path)) as f:
            return cls(json.load(f))

    def __call__(self, name: str, default: int) -> int:
        return int(self.overrides.get(name, default))


@dataclass
class LayerDef:
    """One conv block in forward (= darknet weight file) order."""

    name: str
    out_ch: int
    ksize: int
    stride: int = 1
    groups: int = 1        # == in_ch for depthwise convs
    bn: bool = True
    act: bool = True
    in_ch: int = 0         # filled in by the builder


def pallas_active(which: str, enabled: frozenset) -> bool:
    """Is the Pallas kernel ``which`` selected and runnable on this backend?

    Pallas TPU kernels only execute on TPU (tests exercise them in interpret
    mode); on other backends the pure-XLA ops are used regardless of config.
    """
    if which not in enabled:
        return False
    import jax

    return jax.default_backend() == "tpu"


@dataclass
class ModelBase:
    """Shared config parsing for all model families."""

    anchors: np.ndarray
    num_classes: int
    bn: BNConfig = field(default_factory=BNConfig)
    dtype: jnp.dtype = jnp.bfloat16
    width: ChannelResolver = field(default_factory=ChannelResolver)
    # Pallas kernel selection (``[model] pallas``): subset of
    # {"nms", "fusedpost", "reorg", "dwconv", "dwsep", "pool"}; see yolojax.kernels
    pallas: frozenset = frozenset()
    # ``[model] reorg``: "darknet" (true reorg_cpu semantics — required for
    # darknet .weights import parity) or "s2d" (the clean space-to-depth most
    # torch ports use); see ops/reorg.py
    reorg_order: str = "darknet"

    @classmethod
    def from_config(cls, config, anchors, num_classes, **kw):
        dtype = jnp.dtype(config.get("model", "dtype", fallback="bfloat16")) if config else jnp.bfloat16
        pallas = frozenset(config.get("model", "pallas", fallback="").split()) if config else frozenset()
        reorg_order = config.get("model", "reorg", fallback="darknet") if config else "darknet"
        return cls(anchors=np.asarray(anchors, np.float32), num_classes=num_classes,
                   bn=BNConfig.from_config(config), dtype=dtype,
                   width=ChannelResolver.from_config(config), pallas=pallas,
                   reorg_order=reorg_order, **kw)

    @property
    def out_channels(self) -> int:
        return len(self.anchors) * (5 + self.num_classes)


def build_model(config, anchors, num_classes):
    """Instantiate the configured backbone class (``[model] dnn`` dotted path)."""
    cls = parse_attr(config.get("model", "dnn"))
    return cls.from_config(config, anchors, num_classes)
