"""``convert_darknet`` command: darknet ``.weights`` ↔ yolojax checkpoints
(SURVEY.md §3.5; reference ``convert_darknet_torch.py``).

Import: byte-stream → npz checkpoint in the model dir (step 0), ready for
``train -r`` / ``eval`` / ``detect``.  ``--reverse`` exports a checkpoint
back to darknet format.
"""

from __future__ import annotations

import logging
import os

import jax

from .. import config as _config
from ..tools.darknet import load_weights, save_weights
from ..utils import checkpoint as ckpt
from . import make_parser, setup
from .common import build

_LOG = logging.getLogger(__name__)


def main(argv=None):
    parser = make_parser("convert darknet .weights to a yolojax checkpoint (or back)")
    parser.add_argument("file", help=".weights to import (or checkpoint with --reverse)")
    parser.add_argument("-o", "--output", default=None)
    parser.add_argument("--reverse", action="store_true",
                        help="checkpoint .npz → darknet .weights")
    args = parser.parse_args(argv)
    config = setup(args)
    category, anchors, model = build(config)

    if args.reverse:
        params, state = model.init(jax.random.PRNGKey(0))
        trees, meta = ckpt.load(args.file, {"params": params, "state": state})
        out = args.output or os.path.splitext(args.file)[0] + ".weights"
        save_weights(out, model, trees["params"], trees["state"],
                     seen=int(meta.get("seen", 0)))
        _LOG.info("wrote %s", out)
    else:
        params, state, seen = load_weights(args.file, model)
        out = args.output
        if out is None:
            model_dir = _config.get_model_dir(config)
            os.makedirs(model_dir, exist_ok=True)
            out = os.path.join(model_dir, "0.npz")
        ckpt.save(out, {"params": params, "state": state},
                  {"step": 0, "seen": seen})
        _LOG.info("imported %s → %s (seen=%d)", args.file, out, seen)
    print(out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
