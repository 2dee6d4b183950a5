"""Shared CLI plumbing: model construction and weight resolution."""

from __future__ import annotations

import logging
import os

import jax

from .. import config as _config
from ..category import get_anchors, get_category
from ..models import build_model
from ..utils import checkpoint as ckpt

_LOG = logging.getLogger(__name__)


def build(config):
    """(category, anchors, model) from the ini spec."""
    category = get_category(config)
    anchors = get_anchors(config)
    model = build_model(config, anchors, len(category))
    return category, anchors, model


def load_weights_auto(config, model, path: str | None = None, resume: bool = False,
                      rng_seed: int = 0, reinit_head: bool = False):
    """Resolve initial (params, state, meta) like the reference's train/eval:

    explicit ``path`` (npz checkpoint or darknet .weights) > ``resume`` from
    the newest checkpoint in the model dir > fresh init.
    """
    params, state = model.init(jax.random.PRNGKey(rng_seed))
    if path is None and resume:
        path = ckpt.latest(_config.get_model_dir(config))
        if path is None:
            _LOG.info("no checkpoint to resume; fresh init")
    if path is None:
        return params, state, {}
    if path.endswith(".weights"):
        from ..tools.darknet import load_weights

        params, state, seen = load_weights(
            path, model, reinit_head_on_mismatch=reinit_head, head_rng_seed=rng_seed)
        _LOG.info("imported darknet weights %s (seen=%d)", path, seen)
        return params, state, {"seen": seen}
    trees, meta = ckpt.load(path, {"params": params, "state": state})
    _LOG.info("loaded checkpoint %s (step=%s)", path, meta.get("step"))
    return trees["params"], trees["state"], meta
