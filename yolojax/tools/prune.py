"""Channel pruning: network-slimming by BatchNorm-γ magnitude
(SURVEY.md §2.19; reference ``prune.py`` + ``ConfigChannels`` (recon)).

Rank channels by |γ| across all prunable convs (global quantile threshold),
keep the strongest fraction, then walk the model *plan* slicing weights so
every downstream consumer (sequential convs, depthwise ties, reorg channel
expansion, passthrough concat) receives exactly its surviving inputs.
Emits (a) slimmed params/state and (b) the {layer: width} JSON that
``ChannelResolver`` feeds back into model construction — the same
width-parameterized rebuild mechanism the reference uses.
"""

from __future__ import annotations

import json

import jax.numpy as jnp
import numpy as np

__all__ = ["prune", "save_channels", "gamma_concentration"]


def _rank_threshold(gammas: np.ndarray, ratio: float) -> float:
    """|γ| value at the ``ratio``-removal rank: channels >= it are KEPT.

    Rank-based (``np.partition``), not ``np.quantile`` — quantile
    interpolation at a tie run (e.g. many exactly-zero γ) can land strictly
    inside the run and silently shift how many channels go.  Ties AT the
    threshold are kept, so a tie run never removes more than asked.
    """
    n_remove = min(int(round(ratio * len(gammas))), len(gammas) - 1)
    return float(np.partition(gammas, n_remove)[n_remove])


def _keep_indices(params, defs, ratio: float, skip: frozenset):
    """Global |γ| ranking → per-layer kept channel indices (sorted).

    ``ratio`` is the fraction REMOVED.  (Round-5 fix: this previously
    thresholded at ``quantile(1 - ratio)``, i.e. KEPT the top ``ratio`` —
    the exact inverse of the documented contract; the round-4 "40% prune"
    artifact actually removed 60% of channels.  See DEVNOTES.)
    """
    prunable = [d for d in defs
                if d.bn and d.groups == 1 and d.name not in skip]
    gammas = np.concatenate([np.abs(np.asarray(params[d.name]["gamma"]))
                             for d in prunable])
    threshold = _rank_threshold(gammas, ratio)
    keep = {}
    for d in prunable:
        g = np.abs(np.asarray(params[d.name]["gamma"]))
        idx = np.nonzero(g >= threshold)[0]
        if len(idx) == 0:  # never kill a layer entirely
            idx = np.asarray([int(g.argmax())])
        keep[d.name] = idx
    return keep


def _full_width_skip(model, skip=("out",)) -> set:
    """Layers that must keep full width: the head's final conv (its channels
    are the anchor fields) plus, under darknet reorg semantics, each conv
    feeding a reorg — darknet's true reorg reinterprets the (C,H,W) buffer,
    so output channels mix input channels across rows and per-channel
    pruning cannot propagate through it (the feeder's 64 channels are <1%
    of the model's params)."""
    skip = set(skip)
    if getattr(model, "reorg_order", "darknet") == "darknet":
        last_conv = None
        for op in model.plan:
            if op[0] == "conv":
                last_conv = op[1].name
            elif op[0] == "reorg" and last_conv is not None:
                skip.add(last_conv)
    return skip


def gamma_concentration(model, params, ratio: float, skip=("out",)) -> float:
    """Fraction of total prunable |γ| mass held by the KEPT ``1 - ratio``
    channels under the same global-quantile ranking :func:`prune` uses.

    The network-slimming health signal (VERDICT r4 #3): sparsity training is
    doing its job when the kept channels concentrate most of the scale mass
    (→ 1.0 as unimportant γ are pushed to zero); ≈ ``1 - ratio`` means |γ|
    is uniform and the ranking carries no information.
    """
    skip = frozenset(_full_width_skip(model, skip))
    prunable = [d for d in model.layer_defs
                if d.bn and d.groups == 1 and d.name not in skip]
    g = np.concatenate([np.abs(np.asarray(params[d.name]["gamma"]))
                        for d in prunable])
    threshold = _rank_threshold(g, ratio)
    return float(g[g >= threshold].sum() / max(g.sum(), 1e-12))


def prune(model, params, state, ratio: float, skip=("out",)):
    """Prune ``ratio`` of BN channels → (params, state, channels dict).

    ``ratio`` is the fraction REMOVED (0.3 → keep 70%). ``skip`` layers keep
    full width (the head's final conv must — its channels are the anchor
    fields).
    """
    defs = model.layer_defs
    skip = _full_width_skip(model, skip)
    order = getattr(model, "reorg_order", "darknet")
    keep = _keep_indices(params, defs, ratio, frozenset(skip))

    new_params, new_state, channels = {}, {}, {}
    in_idx = np.arange(3)       # surviving input channels, original ids
    orig_ch = 3                 # original channel count of the running tensor
    slots: dict[str, tuple[np.ndarray, int]] = {}

    for op in model.plan:
        kind = op[0]
        if kind == "conv":
            d = op[1]
            p = {k: np.asarray(v) for k, v in params[d.name].items()}
            s = {k: np.asarray(v) for k, v in state.get(d.name, {}).items()}
            if d.groups > 1:  # depthwise: out channels tied to inputs
                out_idx = in_idx
                p["w"] = p["w"][:, :, :, in_idx]
            else:
                out_idx = keep.get(d.name, np.arange(d.out_ch))
                p["w"] = p["w"][:, :, in_idx, :][:, :, :, out_idx]
            for k in ("gamma", "beta", "b"):
                if k in p:
                    p[k] = p[k][out_idx]
            for k in ("mean", "var"):
                if k in s:
                    s[k] = s[k][out_idx]
            new_params[d.name] = {k: jnp.asarray(v) for k, v in p.items()}
            if s:
                new_state[d.name] = {k: jnp.asarray(v) for k, v in s.items()}
            if d.name in keep:  # depthwise widths follow their input per
                channels[d.name] = int(len(out_idx))  # the model builders
            in_idx = out_idx if d.groups == 1 else in_idx
            orig_ch = d.out_ch if d.groups == 1 else orig_ch
            if d.groups > 1:
                orig_ch = d.out_ch  # == original input count
        elif kind == "mark":
            slots[op[1]] = (in_idx, orig_ch)
        elif kind == "load":
            in_idx, orig_ch = slots[op[1]]
        elif kind == "reorg":
            s2 = op[1] * op[1]
            if order == "darknet":
                # feeder conv was forced full-width above, so the reorg is a
                # fixed bijection: all output channels survive in order
                assert len(in_idx) == orig_ch, "darknet reorg input must be unpruned"
                in_idx = np.arange(orig_ch * s2)
            else:
                # s2d: pruned tensor channel order is offset-major over kept
                # channels; map back to original ids (p*s+q)*C_orig + c
                in_idx = np.concatenate([o * orig_ch + in_idx for o in range(s2)])
            orig_ch *= s2
        elif kind == "concat":
            slot_idx, slot_orig = slots[op[1]]
            in_idx = np.concatenate([in_idx, slot_idx + orig_ch])
            orig_ch += slot_orig

    return new_params, new_state, channels


def save_channels(path: str, channels: dict) -> None:
    with open(path, "w") as f:
        json.dump(channels, f, indent=0, sort_keys=True)
