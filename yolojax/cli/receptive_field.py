"""``receptive_field`` command: effective receptive field probe
(SURVEY.md §2.20; reference ``receptive_field_analyzer.py`` (recon)).

Backpropagates a delta from one output cell and measures the input-gradient
support — the same probe as the reference, via ``jax.grad`` instead of torch
autograd hooks.
"""

from __future__ import annotations

import logging
import os

import jax
import jax.numpy as jnp
import numpy as np

from . import make_parser, setup
from .common import build

_LOG = logging.getLogger(__name__)


def receptive_field(model, params, state, size: int, cell=None):
    """Gradient-support bounding box + effective RF image for one output cell."""
    x = jnp.full((1, size, size, 3), 0.5, jnp.float32)

    def probe(images):
        raw, _ = model.apply(params, state, images, train=False)
        h, w = raw.shape[1], raw.shape[2]
        cy, cx = cell if cell is not None else (h // 2, w // 2)
        return jnp.sum(jnp.abs(raw[0, cy, cx, :]))

    g = np.abs(np.asarray(jax.grad(probe)(x)))[0].sum(-1)  # (S, S)
    ys, xs = np.nonzero(g > 0)
    support = (int(ys.min()), int(xs.min()), int(ys.max()), int(xs.max())) if len(ys) else None
    # effective RF: std of the gradient-mass distribution
    total = g.sum()
    if total > 0:
        yy, xx = np.mgrid[0:size, 0:size]
        cy = (g * yy).sum() / total
        cx = (g * xx).sum() / total
        eff = 2 * np.sqrt(((g * ((yy - cy) ** 2 + (xx - cx) ** 2)).sum() / total) / 2)
    else:
        eff = 0.0
    return g, support, float(eff)


def main(argv=None):
    parser = make_parser("probe the theoretical + effective receptive field")
    parser.add_argument("--size", type=int, default=416)
    parser.add_argument("-o", "--output", default=None, help="heatmap png path")
    args = parser.parse_args(argv)
    config = setup(args)

    category, anchors, model = build(config)
    params, state = model.init(jax.random.PRNGKey(0))
    g, support, eff = receptive_field(model, params, state, args.size)
    if support:
        h = support[2] - support[0] + 1
        w = support[3] - support[1] + 1
        _LOG.info("gradient support %dx%d px, effective RF ≈ %.1f px", h, w, eff)
        print(f"support={h}x{w} effective={eff:.1f}")
    if args.output:
        from PIL import Image

        img = (g / max(g.max(), 1e-12) * 255).astype(np.uint8)
        Image.fromarray(img).save(args.output)
        _LOG.info("wrote %s", args.output)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
