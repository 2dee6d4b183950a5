"""Tiny plan executor shared by all model families.

A model is an ordered *plan* — a list of ops over one running tensor plus
named slots.  The plan is data: the same table drives ``init``, ``apply``,
BN folding, the darknet ``.weights`` importer (conv order = plan order) and
the channel-pruning tool.  This replaces the reference's nn.Module graph with
something XLA-transparent: executing a plan under ``jit`` traces to a single
fused program.

Ops:
    ("conv", LayerDef)        conv(+BN+leaky) block
    ("pool", size, stride)    max pool
    ("mark", key)             save the running tensor into slot ``key``
    ("load", key)             replace the running tensor with slot ``key``
    ("reorg", stride)         darknet space-to-depth (ops/reorg.py)
    ("concat", key)           concat slot ``key`` onto the running tensor
"""

from __future__ import annotations

import jax

from ..ops.reorg import reorg
from . import LayerDef
from .blocks import BNConfig, conv_apply, conv_init, fold_bn, max_pool

__all__ = ["plan_convs", "init_plan", "run_plan", "fold_plan", "resolve_in_channels"]


def plan_convs(plan) -> list[LayerDef]:
    """Conv layers in plan order — also the darknet weight-file order."""
    return [op[1] for op in plan if op[0] == "conv"]


def resolve_in_channels(plan, in_ch: int) -> None:
    """Walk the plan symbolically to fill each LayerDef's ``in_ch``.

    Width changes from pruning propagate automatically because downstream
    in_ch always derives from upstream out_ch (the ConfigChannels mechanism,
    SURVEY.md §2.19).
    """
    ch = in_ch
    slots: dict[str, int] = {}
    for op in plan:
        kind = op[0]
        if kind == "conv":
            d = op[1]
            d.in_ch = ch
            if d.groups == -1:  # depthwise marker
                d.groups = ch
            ch = d.out_ch
        elif kind == "mark":
            slots[op[1]] = ch
        elif kind == "load":
            ch = slots[op[1]]
        elif kind == "reorg":
            ch *= op[1] * op[1]
        elif kind == "concat":
            ch += slots[op[1]]


def init_plan(rng, plan):
    """Initialize (params, state) pytrees for every conv in the plan."""
    defs = plan_convs(plan)
    keys = jax.random.split(rng, len(defs))
    params, state = {}, {}
    for key, d in zip(keys, defs):
        p, s = conv_init(key, d.in_ch, d.out_ch, d.ksize, use_bn=d.bn, groups=d.groups)
        params[d.name] = p
        if s:
            state[d.name] = s
    return params, state


def run_plan(plan, params, state, x, *, bn: BNConfig, train: bool, compute_dtype,
             pallas: frozenset = frozenset(), reorg_order: str = "darknet"):
    """Execute the plan → (output tensor, new_state).

    ``pallas`` selects TPU kernels (inference paths only — the Pallas kernels
    carry no custom VJPs, so training always lowers through XLA).
    ``reorg_order`` selects the passthrough channel semantics (ops/reorg.py);
    the Pallas reorg kernel implements the s2d order only.
    """
    from . import pallas_active

    use_reorg_k = (not train and pallas_active("reorg", pallas)
                   and reorg_order == "s2d")
    use_dw_k = not train and pallas_active("dwconv", pallas)
    use_dwsep = not train and pallas_active("dwsep", pallas)
    use_pool_k = not train and pallas_active("pool", pallas)

    def _dwsep_pair(i, d):
        """Folded dw3×3 + next-op pw1×1 fusable by the Pallas dwsep kernel?
        Gated to small spatial sizes (≤40): XLA's pair lowering is already at
        the fused-traffic roofline at large sizes (DEVNOTES.md)."""
        if not (use_dwsep and d.groups > 1 and d.ksize == 3 and d.act
                and d.in_ch % 128 == 0 and x.shape[1] <= 40
                and "b" in params.get(d.name, {})):
            return None
        nxt = plan[i + 1] if i + 1 < len(plan) else None
        if not (nxt and nxt[0] == "conv"):
            return None
        n = nxt[1]
        if n.ksize == 1 and n.groups == 1 and n.act and "b" in params.get(n.name, {}):
            return n
        return None

    slots = {}
    new_state = dict(state)
    x = x.astype(compute_dtype)
    skip = -1
    for i, op in enumerate(plan):
        if i == skip:
            continue
        kind = op[0]
        if kind == "conv":
            d = op[1]
            n = _dwsep_pair(i, d)
            if n is not None:
                from ..kernels.dwsep import dwsep_pallas

                pd, pp = params[d.name], params[n.name]
                x = dwsep_pallas(x, pd["w"].astype(compute_dtype), pd["b"],
                                 pp["w"].astype(compute_dtype), pp["b"], d.stride)
                skip = i + 1
                continue
            # Pallas dwconv needs lane-aligned channels (Mosaic DMA slices
            # must be 128-wide); the small early layers stay on XLA
            if use_dw_k and d.groups > 1 and d.ksize == 3 and d.in_ch % 128 == 0:
                from ..kernels.dwconv import dwconv3x3_pallas

                p = params[d.name]
                y = dwconv3x3_pallas(x, p["w"].astype(compute_dtype), d.stride)
                x, ns = _post_conv(p, state.get(d.name, {}), y, bn=bn,
                                   act=d.act, compute_dtype=compute_dtype)
            else:
                x, ns = conv_apply(params[d.name], state.get(d.name, {}), x,
                                   stride=d.stride, groups=d.groups, act=d.act,
                                   bn=bn, train=train, compute_dtype=compute_dtype)
            if ns:
                new_state[d.name] = ns
        elif kind == "pool":
            # Pallas path: plain 2×2/2 pools with lane-aligned channels and
            # even spatial dims (the slow mid-stack pools, DEVNOTES.md); the
            # stride-1 SAME tail pool (Tiny) and odd shapes stay on XLA
            if (use_pool_k and op[1] == 2 and op[2] == 2
                    and x.shape[-1] % 128 == 0
                    and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0):
                from ..kernels.pool import maxpool2x2_pallas

                x = maxpool2x2_pallas(x)
            else:
                x = max_pool(x, op[1], op[2])
        elif kind == "mark":
            slots[op[1]] = x
        elif kind == "load":
            x = slots[op[1]]
        elif kind == "reorg":
            if use_reorg_k:
                from ..kernels.reorg import reorg_pallas

                x = reorg_pallas(x, op[1])
            else:
                x = reorg(x, op[1], reorg_order)
        elif kind == "concat":
            x = jax.numpy.concatenate([x, slots[op[1]]], axis=-1)
        else:
            raise ValueError(f"unknown plan op {kind!r}")
    return x, new_state


def _post_conv(params, state, y, *, bn, act, compute_dtype):
    """BN/bias + activation epilogue for externally-computed conv outputs."""
    from .blocks import leaky_relu
    import jax.numpy as jnp

    if "gamma" in params and bn.enable:
        inv = jax.lax.rsqrt(state["var"] + bn.eps)
        if bn.gamma:
            inv = inv * params["gamma"]
        y = (y - state["mean"]) * inv + (params["beta"] if bn.beta else 0.0)
    elif "b" in params:
        y = y + params["b"]
    if act:
        y = leaky_relu(y)
    return y.astype(compute_dtype), {}


def fold_plan(plan, params, state, bn: BNConfig):
    """Fold BN into conv weights for every block → inference-only params."""
    return {d.name: fold_bn(params[d.name], state.get(d.name, {}), bn)
            for d in plan_convs(plan)}
