"""Dataset cache builder (SURVEY.md §2.3; reference ``cache.py`` +
``utils/data/cache/`` (recon)).

One-time offline step: parses the configured dataset modules' annotations
into per-phase pickled lists of numpy records::

    {"path": str, "yx_min": (N,2) f32, "yx_max": (N,2) f32,
     "cls": (N,) i32, "difficult": (N,) bool}

Boxes are normalized to [0, 1] in yx order relative to the image.  Train and
eval never touch the raw annotation formats — they load the pickle.  The
record schema is the interchange format for parity tests.

Dataset modules are dotted paths in ``[cache] datasets`` (e.g.
``yolojax.data.voc``); each must expose ``load(config, phase, category) ->
list[record]``.  Phases: ``train``, ``val``, ``test``.
"""

from __future__ import annotations

import logging
import os
import pickle

import numpy as np

from .. import config as _config
from ..category import get_category

__all__ = ["cache", "load_cache", "make_record", "PHASES"]

PHASES = ("train", "val", "test")
_LOG = logging.getLogger(__name__)


def make_record(path: str, yx_min, yx_max, cls, difficult=None) -> dict:
    """Normalize a parsed annotation into the canonical record schema."""
    yx_min = np.asarray(yx_min, np.float32).reshape(-1, 2)
    yx_max = np.asarray(yx_max, np.float32).reshape(-1, 2)
    cls = np.asarray(cls, np.int32).reshape(-1)
    if difficult is None:
        difficult = np.zeros(len(cls), bool)
    return {
        "path": path,
        "yx_min": yx_min,
        "yx_max": yx_max,
        "cls": cls,
        "difficult": np.asarray(difficult, bool).reshape(-1),
    }


def cache_path(config, phase: str) -> str:
    return os.path.join(_config.get_cache_dir(config), f"{phase}.pkl")


def cache(config, phases=PHASES) -> dict[str, list[dict]]:
    """Build and persist per-phase record caches for all configured datasets."""
    from ..config import parse_attr_list

    modules = parse_attr_list(config.get("cache", "datasets"))
    category = get_category(config)
    os.makedirs(_config.get_cache_dir(config), exist_ok=True)
    out = {}
    for phase in phases:
        records: list[dict] = []
        for module in modules:
            got = module.load(config, phase, category)
            _LOG.info("%s: %s → %d images", phase, module.__name__, len(got))
            records.extend(got)
        with open(cache_path(config, phase), "wb") as f:
            pickle.dump(records, f, protocol=pickle.HIGHEST_PROTOCOL)
        out[phase] = records
    return out


def load_cache(config, phase: str) -> list[dict]:
    path = cache_path(config, phase)
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"no dataset cache at {path}; run `python cache.py` first")
    with open(path, "rb") as f:
        return pickle.load(f)
