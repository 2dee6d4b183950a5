"""Cross-validation of eval_ap.py against an independent AP implementation
(VERDICT round-1 "next" #4; SURVEY.md §2.14).

``vocdevkit_ap`` below is a from-scratch transliteration of the VOCdevkit
MATLAB ``VOCevaldet`` structure: per-image gt tables with claimed flags,
detections kept in the PR arrays even when ignored (tp=fp=0 rows), recall
denominator fixed to the non-difficult gt count.  It shares no code or
structure with yolojax.eval_ap (which instead drops ignored detections from
the curve and groups gts by (image, class)) — the two should agree only if
the protocol itself is implemented correctly in both.  Box convention is the
repo's (normalized yx corners, no VOC +1 pixel inclusivity — both
implementations score the same geometry).

The accuracy pipeline is wrong only if BOTH implementations are wrong the
same way.
"""

import numpy as np
import pytest

from yolojax.eval_ap import DetectionRecorder, evaluate, voc_ap


# ---------------------------------------------------------------- oracle --

def _iou_corners(amin, amax, bmin, bmax):
    """Scalar IoU, written independently (edge-clamped corner form)."""
    iy = min(amax[0], bmax[0]) - max(amin[0], bmin[0])
    ix = min(amax[1], bmax[1]) - max(amin[1], bmin[1])
    if iy <= 0 or ix <= 0:
        return 0.0
    inter = iy * ix
    area_a = (amax[0] - amin[0]) * (amax[1] - amin[1])
    area_b = (bmax[0] - bmin[0]) * (bmax[1] - bmin[1])
    return inter / (area_a + area_b - inter)


def _ap_11pt(rec, prec):
    """11-point interpolation, summed explicitly (VOCdevkit loop form)."""
    ap = 0.0
    for t in (0.0, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 1.0):
        ps = [p for r, p in zip(rec, prec) if r >= t]
        ap += max(ps) if ps else 0.0
    return ap / 11.0


def _ap_continuous(rec, prec):
    """Every-point interpolation via explicit right-to-left envelope."""
    points = sorted(zip(list(rec) + [1.0], list(prec) + [0.0]))
    env, best = [], 0.0
    for r, p in reversed(points):
        best = max(best, p)
        env.append((r, best))
    env.reverse()
    ap, prev_r = 0.0, 0.0
    for r, p in env:
        ap += (r - prev_r) * p
        prev_r = r
    return ap


def vocdevkit_ap(dets, gts, iou_threshold=0.5, use_07_metric=True):
    """AP for ONE class.

    dets: list of (image_id, conf, yx_min(2,), yx_max(2,)).
    gts: {image_id: (yx_min (N,2), yx_max (N,2), difficult (N,) bool)}.
    """
    table = {img: {"mn": np.asarray(mn, float).reshape(-1, 2),
                   "mx": np.asarray(mx, float).reshape(-1, 2),
                   "diff": np.asarray(df, bool).reshape(-1),
                   "claimed": np.zeros(len(df), bool)}
             for img, (mn, mx, df) in gts.items()}
    npos = int(sum((~t["diff"]).sum() for t in table.values()))

    order = sorted(range(len(dets)), key=lambda i: -dets[i][1])
    tp = np.zeros(len(dets))
    fp = np.zeros(len(dets))
    for rank, i in enumerate(order):
        img, _conf, dmin, dmax = dets[i]
        t = table.get(img)
        ovmax, jmax = -1.0, -1
        if t is not None:
            for j in range(len(t["diff"])):
                ov = _iou_corners(dmin, dmax, t["mn"][j], t["mx"][j])
                if ov > ovmax:
                    ovmax, jmax = ov, j
        if ovmax >= iou_threshold:
            if not t["diff"][jmax]:
                if not t["claimed"][jmax]:
                    tp[rank] = 1
                    t["claimed"][jmax] = True
                else:
                    fp[rank] = 1
            # difficult match: neither tp nor fp (row stays zero)
        else:
            fp[rank] = 1

    if len(dets) == 0:
        return 0.0 if npos else float("nan")
    ctp, cfp = np.cumsum(tp), np.cumsum(fp)
    rec = ctp / max(npos, 1)
    prec = ctp / np.maximum(ctp + cfp, 1e-12)
    return (_ap_11pt(rec, prec) if use_07_metric
            else _ap_continuous(list(rec), list(prec)))


def oracle_evaluate(rec: DetectionRecorder, iou_threshold, use_07_metric):
    """mAP via the oracle, reading the recorder's internal accumulation."""
    aps = {}
    for c in range(rec.num_classes):
        gts = {}
        for (img, cc), g in rec.gts.items():
            if cc == c:
                gts[img] = (g["yx_min"], g["yx_max"], g["difficult"])
        dets = rec.dets.get(c, [])
        ap = vocdevkit_ap(list(dets), gts, iou_threshold, use_07_metric)
        if not np.isnan(ap):
            aps[c] = ap
    return float(np.mean(list(aps.values()))) if aps else 0.0


# -------------------------------------------------------------- fixtures --

def adversarial_recorder(rng, num_classes=4, num_images=12, max_gt=6):
    """Random split with near-threshold IoUs, duplicates, difficult gts,
    gt-less images and det-less classes — distinct confidences so stable
    ordering cannot diverge between implementations."""
    rec = DetectionRecorder(num_classes)
    conf_pool = iter(rng.permutation(np.linspace(0.01, 0.99, 4000)))
    for img in range(num_images):
        n = int(rng.integers(0, max_gt + 1))
        if n == 0:
            pass  # gt-less image
        else:
            center = rng.uniform(0.15, 0.85, (n, 2))
            half = rng.uniform(0.03, 0.15, (n, 2))
            cls = rng.integers(0, num_classes, n)
            difficult = rng.uniform(size=n) < 0.25
            rec.add_ground_truth(img, center - half, center + half, cls, difficult)
            # detections correlated with gts: jittered copies (IoU spans the
            # 0.5 threshold), exact duplicates, and shrunk near-misses
            for j in range(n):
                for kind in range(int(rng.integers(0, 4))):
                    jit = rng.uniform(-0.06, 0.06, 2)
                    scale = rng.uniform(0.55, 1.3)
                    dmin = center[j] + jit - half[j] * scale
                    dmax = center[j] + jit + half[j] * scale
                    c = cls[j] if rng.uniform() < 0.8 else rng.integers(0, num_classes)
                    rec.add_detections(img, dmin[None], dmax[None],
                                       np.asarray([next(conf_pool)]),
                                       np.asarray([c]))
        # unconditioned random detections (pure FPs, incl. on gt-less images)
        for _ in range(int(rng.integers(0, 3))):
            p = rng.uniform(0.1, 0.7, 2)
            q = p + rng.uniform(0.05, 0.3, 2)
            rec.add_detections(img, p[None], q[None],
                               np.asarray([next(conf_pool)]),
                               np.asarray([int(rng.integers(0, num_classes))]))
    return rec


@pytest.mark.parametrize("seed", range(20))
@pytest.mark.parametrize("use07", [True, False])
def test_evaluate_matches_independent_oracle(seed, use07):
    rng = np.random.default_rng(seed)
    rec = adversarial_recorder(rng)
    ours = evaluate(rec, iou_threshold=0.5, use_07_metric=use07)["map"]
    oracle = oracle_evaluate(rec, 0.5, use07)
    np.testing.assert_allclose(ours, oracle, rtol=0, atol=1e-12)


@pytest.mark.parametrize("thr", [0.3, 0.5, 0.75])
def test_evaluate_matches_oracle_across_thresholds(thr):
    rng = np.random.default_rng(99)
    rec = adversarial_recorder(rng, num_classes=3, num_images=20)
    ours = evaluate(rec, iou_threshold=thr, use_07_metric=True)["map"]
    np.testing.assert_allclose(ours, oracle_evaluate(rec, thr, True), atol=1e-12)


# ------------------------------------------------- hand-computed goldens --

def test_voc_ap_hand_computed_11pt_and_continuous():
    """npos=4, ranked TP,FP,TP,TP,FP,TP (worked by hand):
    recall  [.25,.25,.5,.75,.75,1]; precision [1,.5,2/3,.75,.6,2/3]
    11pt = (3·1 + 5·0.75 + 3·(2/3)) / 11 = 8.75/11
    continuous = .25·1 + .25·.75 + .25·.75 + .25·(2/3) = 0.7916̄
    """
    rec = np.asarray([0.25, 0.25, 0.5, 0.75, 0.75, 1.0])
    prec = np.asarray([1.0, 0.5, 2 / 3, 0.75, 0.6, 2 / 3])
    np.testing.assert_allclose(voc_ap(rec, prec, True), 8.75 / 11, rtol=1e-12)
    np.testing.assert_allclose(voc_ap(rec, prec, False), 0.25 * (1 + 0.75 + 0.75 + 2 / 3),
                               rtol=1e-12)
    # the independent formulations agree on the same curve
    np.testing.assert_allclose(_ap_11pt(rec, prec), 8.75 / 11, rtol=1e-12)
    np.testing.assert_allclose(_ap_continuous(list(rec), list(prec)),
                               0.25 * (1 + 0.75 + 0.75 + 2 / 3), rtol=1e-12)


def test_recorder_golden_tp_fp_pattern_end_to_end():
    """A geometric fixture realizing exactly TP,FP,TP,TP,FP,TP (npos=4)."""
    rec = DetectionRecorder(1)
    g = np.asarray([[0.0, 0.0], [0.0, 0.5], [0.5, 0.0], [0.5, 0.5]])
    rec.add_ground_truth("im", g, g + 0.4, np.zeros(4, int), np.zeros(4, bool))
    hit = lambda i: (g[i][None], (g[i] + 0.4)[None])
    miss = (np.asarray([[0.45, 0.45]]), np.asarray([[0.55, 0.55]]))
    seq = [hit(0), miss, hit(1), hit(2), miss, hit(3)]
    for rank, (dmin, dmax) in enumerate(seq):
        rec.add_detections("im", dmin, dmax,
                           np.asarray([0.9 - 0.1 * rank]), np.asarray([0]))
    res07 = evaluate(rec, use_07_metric=True)["map"]
    resC = evaluate(rec, use_07_metric=False)["map"]
    np.testing.assert_allclose(res07, 8.75 / 11, rtol=1e-12)
    np.testing.assert_allclose(resC, 0.25 * (1 + 0.75 + 0.75 + 2 / 3), rtol=1e-12)
