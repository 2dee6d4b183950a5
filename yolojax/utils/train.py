"""Optimizer / LR-schedule factories resolved from config dotted paths.

The reference constructs its optimizer and scheduler from dotted paths in the
``[train]`` section (SURVEY.md §2.13: SGD momentum 0.9, weight decay 5e-4,
step LR schedule per the paper).  These factories keep that surface —
``[train] optimizer = yolojax.utils.train.sgd`` — and return optax
transforms, which compose into the jitted train step (the whole update is
part of one XLA program, unlike the reference's Python-side optimizer.step).
"""

from __future__ import annotations

import optax

__all__ = ["sgd", "adam", "step_schedule", "constant_schedule", "build_optimizer",
           "with_frozen"]


def step_schedule(config):
    """Piecewise-constant decay: ``[train] milestones`` steps × ``gamma``."""
    base = config.getfloat("train", "learning_rate", fallback=1e-3)
    gamma = config.getfloat("train", "gamma", fallback=0.1)
    raw = config.get("train", "milestones", fallback="").replace(",", " ").split()
    milestones = [int(v) for v in raw]
    return optax.piecewise_constant_schedule(
        base, {m: gamma for m in milestones})


def constant_schedule(config):
    base = config.getfloat("train", "learning_rate", fallback=1e-3)
    return optax.constant_schedule(base)


def _schedule(config):
    from ..config import parse_attr

    path = config.get("train", "scheduler", fallback="yolojax.utils.train.step_schedule")
    return parse_attr(path)(config)


def _leaf_is(path, name: str) -> bool:
    """Match a pytree leaf by its dict key (the ONE shared stringly predicate
    for the param-naming contract: conv kernels are ``'w'``, BN scales are
    ``'gamma'`` — established where params are created, models/blocks.py
    ``conv_init``).  Used by both ``_decay_mask`` and ``add_bn_l1`` so a
    future rename breaks in one place, not silently in one of two."""
    return str(path[-1]) == f"['{name}']"


def _common_parts(config) -> list:
    """Transform prefix shared by every optimizer factory: global-norm clip
    (``[train] clip``) and network-slimming BN-γ L1 (``[train] sparsity``)."""
    parts = []
    clip = config.getfloat("train", "clip", fallback=0.0)
    if clip > 0:
        parts.append(optax.clip_by_global_norm(clip))
    sp = config.getfloat("train", "sparsity", fallback=0.0)
    if sp > 0:
        parts.append(add_bn_l1(sp))
    return parts


def sgd(config) -> optax.GradientTransformation:
    """SGD + momentum + decoupled weight decay (darknet training recipe)."""
    parts = _common_parts(config)
    wd = config.getfloat("train", "weight_decay", fallback=5e-4)
    if wd > 0:
        parts.append(optax.add_decayed_weights(wd, mask=_decay_mask))
    parts.append(optax.sgd(_schedule(config),
                           momentum=config.getfloat("train", "momentum", fallback=0.9)))
    return optax.chain(*parts)


def add_bn_l1(lam: float) -> optax.GradientTransformation:
    """Network-slimming sparsity: ``loss += lam * sum(|gamma|)`` over BN
    scales, applied as the L1 subgradient ``lam * sign(gamma)`` added to the
    incoming gradient (SURVEY.md §2.19 / PAPERS.md network slimming: the
    channel-importance signal |gamma| is only meaningful when training pushes
    unimportant scales toward zero).  Config: ``[train] sparsity``.
    """
    import jax
    import jax.numpy as jnp

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        if params is None:
            raise ValueError("add_bn_l1 requires params")
        updates = jax.tree_util.tree_map_with_path(
            lambda path, u, p: u + lam * jnp.sign(p).astype(u.dtype)
            if _leaf_is(path, "gamma") else u,
            updates, params)
        return updates, state

    return optax.GradientTransformation(init, update)


def adam(config) -> optax.GradientTransformation:
    parts = _common_parts(config)
    parts.append(optax.adamw(
        _schedule(config),
        weight_decay=config.getfloat("train", "weight_decay", fallback=0.0),
        mask=_decay_mask))  # decay conv kernels only, like the sgd factory
    return optax.chain(*parts)


def _decay_mask(params):
    """Weight decay applies to conv kernels only, not BN affine or biases
    (darknet decays only weights)."""
    import jax

    return jax.tree_util.tree_map_with_path(
        lambda path, _: _leaf_is(path, "w"), params)


def with_frozen(optimizer: optax.GradientTransformation, params,
                frozen_layers) -> optax.GradientTransformation:
    """Freeze whole layers by name during finetuning (SURVEY.md §2.13:
    "optionally freeze ... when class count differs").

    ``frozen_layers`` — layer names (top-level keys of the params tree) whose
    parameters receive zero updates; everything else trains normally.
    """
    frozen = set(frozen_layers)

    def label(tree):
        return {name: ("freeze" if name in frozen else "train")
                for name in tree}

    return optax.multi_transform(
        {"train": optimizer, "freeze": optax.set_to_zero()}, label)


def build_optimizer(config) -> optax.GradientTransformation:
    from ..config import parse_attr

    factory = parse_attr(config.get("train", "optimizer", fallback="yolojax.utils.train.sgd"))
    return factory(config)
