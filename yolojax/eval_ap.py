"""VOC-protocol average precision (SURVEY.md §2.14; reference ``eval.py`` +
AP helpers (recon)).

Per class: detections sorted by confidence are matched greedily to the
highest-IoU unmatched ground-truth box in their image; IoU ≥ threshold on an
unmatched gt → TP, otherwise FP; *difficult* gts never count — detections
matched to them are ignored entirely (removed from the PR curve), and they
are excluded from the positive count, per the VOCdevkit protocol.

Both AP variants are provided: VOC2007 11-point interpolation and the
continuous (every-point) integral; ``[eval] metric07`` selects one.

This runs host-side in numpy: AP accumulation is inherently ragged (variable
detections per image), and it is off the hot path — the on-device part of
eval is forward+decode+NMS (ops/postprocess.py).
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np

from .ops.iou import np_iou_matrix

__all__ = ["voc_ap", "DetectionRecorder", "evaluate"]


def voc_ap(recall: np.ndarray, precision: np.ndarray, use_07_metric: bool = True) -> float:
    """AP from a PR curve; 11-point (VOC2007) or continuous interpolation."""
    if recall.size == 0:
        return 0.0
    if use_07_metric:
        ap = 0.0
        # thresholds as i/10, NOT linspace/arange: those yield
        # 0.6000000000000001 etc., silently excluding recalls that equal the
        # threshold exactly (k/npos == 3/5) — caught by the independent
        # cross-validation oracle (tests/test_ap_crossval.py)
        for t in (np.arange(11) / 10.0):
            mask = recall >= t
            ap += (precision[mask].max() if mask.any() else 0.0) / 11.0
        return float(ap)
    # continuous: envelope the precision, integrate over recall steps
    mrec = np.concatenate([[0.0], recall, [1.0]])
    mpre = np.concatenate([[0.0], precision, [0.0]])
    mpre = np.maximum.accumulate(mpre[::-1])[::-1]
    idx = np.where(mrec[1:] != mrec[:-1])[0]
    return float(np.sum((mrec[idx + 1] - mrec[idx]) * mpre[idx + 1]))


class DetectionRecorder:
    """Accumulates detections and ground truth across the eval split."""

    def __init__(self, num_classes: int):
        self.num_classes = num_classes
        # per class: lists of (image_id, conf, yx_min, yx_max)
        self.dets: dict[int, list] = defaultdict(list)
        # per (image_id, class): gt boxes + difficult flags
        self.gts: dict[tuple, dict] = {}

    def add_ground_truth(self, image_id, yx_min, yx_max, cls, difficult):
        yx_min = np.asarray(yx_min, np.float64).reshape(-1, 2)
        yx_max = np.asarray(yx_max, np.float64).reshape(-1, 2)
        cls = np.asarray(cls).reshape(-1)
        difficult = np.asarray(difficult, bool).reshape(-1)
        for c in np.unique(cls):
            sel = cls == c
            key = (image_id, int(c))
            new = {"yx_min": yx_min[sel], "yx_max": yx_max[sel],
                   "difficult": difficult[sel]}
            old = self.gts.get(key)
            if old is not None:  # merge repeated calls for the same image
                new = {k: np.concatenate([old[k], new[k]]) for k in new}
            self.gts[key] = new

    def add_detections(self, image_id, yx_min, yx_max, conf, cls):
        for i in range(len(conf)):
            self.dets[int(cls[i])].append(
                (image_id, float(conf[i]), np.asarray(yx_min[i]), np.asarray(yx_max[i])))


def _class_ap(dets: list, gts: dict, cls: int, iou_threshold: float,
              use_07_metric: bool) -> float:
    npos = sum((~g["difficult"]).sum() for (_, c), g in gts.items() if c == cls)
    if not dets:
        return 0.0 if npos else float("nan")
    dets = sorted(dets, key=lambda d: -d[1])
    matched: dict = defaultdict(set)
    tp = np.zeros(len(dets))
    fp = np.zeros(len(dets))
    for i, (img, _conf, dmin, dmax) in enumerate(dets):
        g = gts.get((img, cls))
        if g is None or len(g["difficult"]) == 0:
            fp[i] = 1
            continue
        ious = np_iou_matrix(dmin[None], dmax[None], g["yx_min"], g["yx_max"])[0]
        j = int(ious.argmax())
        if ious[j] >= iou_threshold:
            if g["difficult"][j]:
                continue  # matched a difficult gt: ignore this detection
            if j in matched[img]:
                fp[i] = 1  # duplicate detection of an already-claimed gt
            else:
                tp[i] = 1
                matched[img].add(j)
        else:
            fp[i] = 1
    keep = (tp + fp) > 0  # detections matched to difficult gts were skipped
    tp, fp = tp[keep], fp[keep]
    ctp, cfp = np.cumsum(tp), np.cumsum(fp)
    recall = ctp / max(npos, 1)
    precision = ctp / np.maximum(ctp + cfp, 1e-12)
    return voc_ap(recall, precision, use_07_metric)


def evaluate(recorder: DetectionRecorder, iou_threshold: float = 0.5,
             use_07_metric: bool = True) -> dict:
    """Per-class AP + mAP over the accumulated split."""
    aps = {}
    for c in range(recorder.num_classes):
        ap = _class_ap(recorder.dets.get(c, []), recorder.gts, c,
                       iou_threshold, use_07_metric)
        if not np.isnan(ap):
            aps[c] = ap
    mean = float(np.mean(list(aps.values()))) if aps else 0.0
    return {"ap": aps, "map": mean}
