"""``detect`` command: single image / video file / camera detection
(SURVEY.md §3.3; BASELINE config 1).

Pipeline: read frame → centered gray canvas → letterbox to ``[detect]`` size
→ folded forward + decode + per-class NMS (one jitted program) → invert the
letterbox → draw class/conf-labelled boxes.
"""

from __future__ import annotations

import logging
import os

import jax
import numpy as np

from ..config import get_canvas
from ..data.dataset import GRAY
from ..data.transform import resize_from_config
from ..models.inference import Inference
from ..utils.visualize import draw_boxes
from . import make_parser, setup
from .common import build, load_weights_auto

_LOG = logging.getLogger(__name__)


def _to_canvas(img: np.ndarray, canvas: int):
    h, w = img.shape[:2]
    if max(h, w) > canvas:
        import cv2

        s = canvas / max(h, w)
        img = cv2.resize(img, (max(1, int(w * s)), max(1, int(h * s))),
                         interpolation=cv2.INTER_AREA)
        h, w = img.shape[:2]
    out = np.full((canvas, canvas, 3), GRAY, np.uint8)
    oy, ox = (canvas - h) // 2, (canvas - w) // 2
    out[oy:oy + h, ox:ox + w] = img
    return out, np.asarray([h, w], np.float32)


def detect_image(config, model, params, state, image: np.ndarray, size: int):
    """Run detection on one RGB uint8 image → (yx_min, yx_max, cls, conf),
    normalized to the input image."""
    threshold = config.getfloat("detect", "threshold", fallback=0.4)
    overlap = config.getfloat("detect", "overlap", fallback=0.45)
    topk = config.getint("detect", "topk", fallback=100)
    inference = Inference(model)
    folded = inference.fold(params, state)
    import jax as _jax

    from ..native import native_nms_available

    if _jax.default_backend() == "cpu" and native_nms_available():
        run = inference.detect_fn_host(threshold, overlap, topk)
    else:
        run = inference.detect_fn(threshold, overlap, topk)

    canvas_size = get_canvas(config)
    canvas, hw = _to_canvas(image, canvas_size)
    resize = resize_from_config(config)
    images, scale, pad = resize(canvas[None], hw[None], size)
    out = jax.device_get(run(folded, images))
    scale, pad = np.asarray(scale[0]), np.asarray(pad[0])

    boxes_min, boxes_max, cls, conf = [], [], [], []
    num_classes = out.conf.shape[1]
    for c in range(num_classes):
        keep = out.keep[0, c]
        if not keep.any():
            continue
        dmin = (out.yx_min[0, c][keep] * size - pad) / scale / hw
        dmax = (out.yx_max[0, c][keep] * size - pad) / scale / hw
        boxes_min.append(np.clip(dmin, 0, 1))
        boxes_max.append(np.clip(dmax, 0, 1))
        cls.extend([c] * int(keep.sum()))
        conf.extend(out.conf[0, c][keep].tolist())
    if not cls:
        return (np.zeros((0, 2)), np.zeros((0, 2)),
                np.zeros((0,), np.int32), np.zeros((0,)))
    return (np.concatenate(boxes_min), np.concatenate(boxes_max),
            np.asarray(cls, np.int32), np.asarray(conf))


def main(argv=None):
    parser = make_parser("detect objects in an image (or camera stream)")
    parser.add_argument("input", help="image path, video path, or an integer "
                                      "camera index")
    parser.add_argument("-f", "--file", default=None,
                        help="checkpoint .npz or darknet .weights (default: latest)")
    parser.add_argument("--size", type=int, default=None)
    parser.add_argument("-o", "--output", default=None, help="output image path")
    parser.add_argument("--show", action="store_true", help="matplotlib display")
    args = parser.parse_args(argv)
    config = setup(args)

    category, anchors, model = build(config)
    params, state, _ = load_weights_auto(config, model, args.file, resume=args.file is None)
    size = args.size or int(config.get("data", "sizes").split(",")[0])

    import cv2

    def handle(frame_rgb, tag: str, write: bool = True):
        ymin, ymax, cls, conf = detect_image(config, model, params, state, frame_rgb, size)
        for i in range(len(cls)):
            _LOG.info("%s: %s %.2f @ %s %s", tag, category[cls[i]], conf[i],
                      ymin[i].round(3), ymax[i].round(3))
        drawn = draw_boxes(frame_rgb, ymin, ymax, cls, conf, category)
        if write and args.output:
            cv2.imwrite(args.output, drawn[:, :, ::-1])
            _LOG.info("wrote %s", args.output)
        if args.show:
            import matplotlib.pyplot as plt

            plt.imshow(drawn)
            plt.axis("off")
            plt.show()
        return drawn

    def run_capture(cap, tag: str) -> int:
        """Frame loop shared by the camera and video-file paths; with ``-o``
        the annotated frames are written back out as one video."""
        writer, n = None, 0
        try:
            while True:
                ok, frame = cap.read()
                if not ok:
                    break
                drawn = handle(frame[:, :, ::-1], f"{tag}#{n}", write=False)
                if args.output:
                    if writer is None:
                        fps = cap.get(cv2.CAP_PROP_FPS)
                        fourcc = "mp4v" if args.output.endswith(".mp4") else "MJPG"
                        writer = cv2.VideoWriter(
                            args.output, cv2.VideoWriter_fourcc(*fourcc),
                            fps if fps and fps > 0 else 25.0,
                            (drawn.shape[1], drawn.shape[0]))
                    writer.write(np.ascontiguousarray(drawn[:, :, ::-1]))
                n += 1
        finally:
            cap.release()
            if writer is not None:
                writer.release()
                _LOG.info("wrote %s (%d frames)", args.output, n)
        return n

    if args.input.isdigit():  # camera loop
        run_capture(cv2.VideoCapture(int(args.input)), "cam")
    else:
        img = cv2.imread(args.input, cv2.IMREAD_COLOR)
        if img is not None:
            handle(img[:, :, ::-1], os.path.basename(args.input))
        else:  # not an image — try it as a video container
            cap = cv2.VideoCapture(args.input)
            if not (cap.isOpened()
                    and run_capture(cap, os.path.basename(args.input))):
                raise SystemExit(f"cannot read {args.input}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
