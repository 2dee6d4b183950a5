"""Pytree checkpointing (SURVEY.md §5 "Checkpoint/resume").

The reference saves ``torch.save(state_dict)`` to ``<model_dir>/<step>.pth``
on a seconds cadence and on SIGINT, resuming from the latest (reference
``utils/train.py: Saver`` (recon)).  Here a checkpoint is a single ``.npz``
holding the flattened {params, state, opt_state} pytrees plus a JSON meta
blob {step, seen, rng} — dependency-free, byte-deterministic, and directly
producible by the darknet importer.
"""

from __future__ import annotations

import glob
import json
import os
import re

import jax
import numpy as np

__all__ = ["save", "load", "latest", "Saver"]

_META_KEY = "__meta__"


def _flatten(tree, prefix: str) -> dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = prefix + "".join(str(p) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def _unflatten(template, flat: dict[str, np.ndarray], prefix: str):
    leaves = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(template)[0]:
        key = prefix + "".join(str(p) for p in path)
        if key not in flat:
            raise KeyError(f"checkpoint missing {key!r}")
        arr = flat[key]
        if hasattr(leaf, "shape") and tuple(arr.shape) != tuple(leaf.shape):
            raise ValueError(f"checkpoint {key!r} shape {arr.shape} != model {leaf.shape}")
        leaves.append(arr)
    return jax.tree_util.tree_unflatten(jax.tree_util.tree_structure(template), leaves)


def save(path: str, trees: dict, meta: dict | None = None) -> None:
    """Save named pytrees + JSON-serializable meta to one .npz."""
    flat: dict[str, np.ndarray] = {}
    for name, tree in trees.items():
        flat.update(_flatten(tree, name + ":"))
    flat[_META_KEY] = np.frombuffer(json.dumps(meta or {}).encode(), np.uint8)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **flat)
    os.replace(tmp, path)  # atomic: a crash never leaves a torn checkpoint


def load(path: str, templates: dict) -> tuple[dict, dict]:
    """Load named pytrees (validated against templates) + meta."""
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    meta = json.loads(bytes(flat.pop(_META_KEY)).decode()) if _META_KEY in flat else {}
    trees = {name: _unflatten(tpl, flat, name + ":") for name, tpl in templates.items()}
    return trees, meta


def contains(path: str, name: str) -> bool:
    """Whether a checkpoint holds any keys for the named pytree (e.g. a
    darknet-converted ``0.npz`` has params/state but no ``opt:*``)."""
    with np.load(path) as z:
        prefix = name + ":"
        return any(k.startswith(prefix) for k in z.files)


def latest(model_dir: str) -> str | None:
    """Newest step checkpoint in a model dir (``<step>.npz``)."""
    paths = glob.glob(os.path.join(model_dir, "*.npz"))
    steps = [(int(m.group(1)), p) for p in paths
             if (m := re.fullmatch(r"(\d+)\.npz", os.path.basename(p)))]
    return max(steps)[1] if steps else None


class Saver:
    """Seconds-cadence checkpointing with a keep-N window (reference
    semantics: time-based cadence, SURVEY.md §2.13)."""

    def __init__(self, model_dir: str, interval: float = 600.0, keep: int = 5):
        self.model_dir = model_dir
        self.interval = interval
        self.keep = keep
        self._last = None
        os.makedirs(model_dir, exist_ok=True)

    def due(self, now: float) -> bool:
        if self._last is None:
            self._last = now
            return False
        return now - self._last >= self.interval

    def __call__(self, now: float, step: int, trees: dict, meta: dict) -> str:
        self._last = now
        path = os.path.join(self.model_dir, f"{step}.npz")
        save(path, trees, meta)
        self._prune()
        return path

    def _prune(self) -> None:
        paths = sorted(
            ((int(os.path.basename(p)[:-4]), p)
             for p in glob.glob(os.path.join(self.model_dir, "*.npz"))
             if os.path.basename(p)[:-4].isdigit()))
        for _, p in paths[:-self.keep] if self.keep else []:
            os.remove(p)
