"""``export`` command: serialize the inference graph (SURVEY.md §2.17 analog
of the reference's ``convert_torch_onnx.py``).

The TPU-native interchange is **StableHLO via jax.export** — the decode is
part of the exported program (the reference exports its ``Inference`` wrapper
to ONNX for the same reason: one shared decode everywhere).  The exported
artifact replays on any XLA runtime (`jax.export.deserialize(...).call`).
``--format onnx`` emits a real ONNX ModelProto via the self-contained
protobuf writer in tools/onnx_export.py (the image lacks the ``onnx``
package, so the wire format is produced and verified in-repo).
"""

from __future__ import annotations

import logging
import os

import numpy as np

from .. import config as _config
from ..models.inference import Inference
from ..ops.decode import decode_flat
from . import make_parser, setup
from .common import build, load_weights_auto

_LOG = logging.getLogger(__name__)


def main(argv=None):
    parser = make_parser("export forward+decode as a serialized StableHLO program")
    parser.add_argument("-f", "--file", default=None,
                        help="checkpoint or .weights (default: latest)")
    parser.add_argument("--size", type=int, default=416)
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("-o", "--output", default=None, help="output .stablehlo path")
    parser.add_argument("--format", choices=["stablehlo", "onnx"], default="stablehlo")
    args = parser.parse_args(argv)
    config = setup(args)

    import jax
    import jax.numpy as jnp

    category, anchors, model = build(config)
    params, state, _ = load_weights_auto(config, model, args.file,
                                         resume=args.file is None)
    inference = Inference(model)
    folded = inference.fold(params, state)
    anchors_dev = jnp.asarray(anchors)

    if args.format == "onnx":
        # self-contained protobuf emission — no onnx package needed
        # (tools/onnx_export.py; verified by tests/test_onnx_export.py)
        from ..tools.onnx_export import export_onnx

        blob = export_onnx(model, jax.device_get(folded), anchors,
                           args.size, batch=args.batch)
        out = args.output
        if out is None:
            model_dir = _config.get_model_dir(config)
            os.makedirs(model_dir, exist_ok=True)
            out = os.path.join(model_dir, f"inference_{args.size}.onnx")
        with open(out, "wb") as f:
            f.write(blob)
        _LOG.info("exported ONNX %d bytes (NCHW input %s)", len(blob),
                  (args.batch, 3, args.size, args.size))
        print(out)
        return 0

    def fn(images):
        # packed (B, N, 5+C) [ymin,xmin,ymax,xmax,iou,conf...] — one output
        # tensor so any runtime can consume it (reference exports the same
        # decode-wrapped graph)
        raw = model.apply_folded(folded, images)
        return decode_flat(raw, anchors_dev)

    spec = jax.ShapeDtypeStruct((args.batch, args.size, args.size, 3), jnp.float32)
    exported = jax.export.export(jax.jit(fn))(spec)
    blob = exported.serialize()

    out = args.output
    if out is None:
        model_dir = _config.get_model_dir(config)
        os.makedirs(model_dir, exist_ok=True)
        out = os.path.join(model_dir, f"inference_{args.size}.stablehlo")
    with open(out, "wb") as f:
        f.write(blob)
    _LOG.info("exported %d bytes (in: %s)", len(blob), spec.shape)
    print(out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
