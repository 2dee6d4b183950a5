"""``demo_data`` command: visualize augmented training samples
(SURVEY.md §2.15 — the reference's sanity check that image and boxes
transform consistently)."""

from __future__ import annotations

import logging
import os

import jax
import numpy as np

from ..config import get_canvas
from ..category import get_category
from ..data.cache import load_cache
from ..data.dataset import Dataset
from ..data.loader import Loader
from ..data.transform import TrainAugment
from ..utils.visualize import draw_boxes
from . import make_parser, setup

_LOG = logging.getLogger(__name__)


def main(argv=None):
    parser = make_parser("visualize augmented training batches with gt boxes")
    parser.add_argument("-n", "--num", type=int, default=8, help="images to dump")
    parser.add_argument("--size", type=int, default=416)
    parser.add_argument("-o", "--output", default="demo_data_out")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)
    config = setup(args)

    category = get_category(config)
    records = load_cache(config, "train")
    dataset = Dataset(records, canvas=get_canvas(config),
                      max_boxes=config.getint("data", "max_boxes", fallback=60))
    loader = Loader(dataset, batch_size=min(args.num, len(dataset)), seed=args.seed)
    augment = TrainAugment.from_config(config)
    os.makedirs(args.output, exist_ok=True)

    batch = next(iter(loader.epoch()))
    images, bmin, bmax, bvalid = augment(
        jax.random.PRNGKey(args.seed), batch["canvas"], batch["hw"],
        batch["yx_min"], batch["yx_max"], batch["valid"], args.size)
    for b in range(images.shape[0]):
        v = np.asarray(bvalid[b])
        drawn = draw_boxes(np.asarray(images[b], np.float32),
                           np.asarray(bmin[b])[v], np.asarray(bmax[b])[v],
                           np.asarray(batch["cls"][b])[v], category=category)
        path = os.path.join(args.output, f"sample{b}.png")
        from PIL import Image

        Image.fromarray(drawn).save(path)
        _LOG.info("wrote %s (%d boxes)", path, int(v.sum()))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
