"""NMS correctness: the on-device masked NMS must exactly match sequential
greedy NMS (SURVEY.md §7 "On-device NMS ... verify exact-match vs CPU NMS")."""

import numpy as np

from yolojax.ops.iou import np_iou_matrix
from yolojax.ops.nms import nms_mask, nms_select, nms_topk


def greedy_nms_reference(yx_min, yx_max, scores, overlap, valid):
    """Plain sequential greedy NMS (the reference's CPU algorithm)."""
    order = np.argsort(-scores)
    keep = np.zeros(len(scores), dtype=bool)
    kept = []
    for i in order:
        if not valid[i]:
            continue
        ok = True
        for j in kept:
            iou = np_iou_matrix(yx_min[i:i + 1], yx_max[i:i + 1],
                                yx_min[j:j + 1], yx_max[j:j + 1])[0, 0]
            if iou > overlap:
                ok = False
                break
        if ok:
            keep[i] = True
            kept.append(i)
    return keep


def random_boxes(rng, n):
    center = rng.uniform(0.2, 0.8, (n, 2)).astype(np.float32)
    half = rng.uniform(0.05, 0.2, (n, 2)).astype(np.float32)
    return (center - half), (center + half)


def test_nms_mask_matches_sequential(rng):
    for trial in range(10):
        n = 40
        yx_min, yx_max = random_boxes(rng, n)
        scores = rng.uniform(0, 1, n).astype(np.float32)
        valid = rng.uniform(0, 1, n) > 0.2
        got = np.asarray(nms_mask(yx_min, yx_max, scores, 0.45, valid))
        want = greedy_nms_reference(yx_min, yx_max, scores, 0.45, valid)
        np.testing.assert_array_equal(got, want)


def test_nms_simple_golden():
    # two near-identical boxes + one far box: keep best of the pair + far box
    yx_min = np.asarray([[0, 0], [0.01, 0.0], [0.5, 0.5]], dtype=np.float32)
    yx_max = np.asarray([[0.2, 0.2], [0.21, 0.2], [0.7, 0.7]], dtype=np.float32)
    scores = np.asarray([0.9, 0.8, 0.7], dtype=np.float32)
    keep = np.asarray(nms_mask(yx_min, yx_max, scores, 0.45))
    np.testing.assert_array_equal(keep, [True, False, True])


def test_nms_topk_threshold_and_sorting(rng):
    n = 30
    yx_min, yx_max = random_boxes(rng, n)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    ymin, ymax, top, keep = nms_topk(yx_min, yx_max, scores, 0.5, 0.45, 10)
    top = np.asarray(top)
    assert top.shape == (10,)
    assert np.all(np.diff(top) <= 0)  # descending
    assert not np.any(np.asarray(keep) & (top <= 0.5))  # thresholded


def test_nms_select_matches_sequential(rng):
    """The while-loop production NMS must agree with sequential greedy NMS."""
    for trial in range(10):
        n = 50
        yx_min, yx_max = random_boxes(rng, n)
        scores = rng.uniform(0, 1, n).astype(np.float32)
        threshold = 0.3
        idx, conf, valid = nms_select(yx_min, yx_max, scores, threshold, 0.45, n)
        got = sorted(np.asarray(idx)[np.asarray(valid)].tolist())
        want_mask = greedy_nms_reference(yx_min, yx_max, scores, 0.45,
                                         scores > threshold)
        want = sorted(np.nonzero(want_mask)[0].tolist())
        assert got == want, trial
        # scores come out in descending order
        kept = np.asarray(conf)[np.asarray(valid)]
        assert np.all(np.diff(kept) <= 0)


def test_nms_select_max_out_truncates(rng):
    n = 30
    yx_min, yx_max = random_boxes(rng, n)
    # spread boxes far apart so nothing suppresses: expect exactly max_out
    yx_min = yx_min + np.arange(n)[:, None].astype(np.float32)
    yx_max = yx_max + np.arange(n)[:, None].astype(np.float32)
    scores = rng.uniform(0.5, 1, n).astype(np.float32)
    idx, conf, valid = nms_select(yx_min, yx_max, scores, 0.1, 0.45, 7)
    assert int(np.asarray(valid).sum()) == 7
    np.testing.assert_allclose(np.asarray(conf)[:7], np.sort(scores)[::-1][:7],
                               rtol=1e-6)


def test_nms_select_degenerate_boxes_terminate():
    """Zero-area candidates must not wedge the while loop."""
    yx_min = np.zeros((5, 2), np.float32)
    yx_max = np.zeros((5, 2), np.float32)  # all degenerate
    scores = np.asarray([0.9, 0.8, 0.7, 0.6, 0.5], np.float32)
    idx, conf, valid = nms_select(yx_min, yx_max, scores, 0.1, 0.45, 5)
    # each degenerate box only suppresses itself → all 5 emitted in order
    assert int(np.asarray(valid).sum()) == 5
    np.testing.assert_array_equal(np.asarray(idx), [0, 1, 2, 3, 4])


def test_nms_all_suppressed_when_identical():
    yx_min = np.zeros((5, 2), np.float32)
    yx_max = np.ones((5, 2), np.float32)
    scores = np.asarray([0.1, 0.5, 0.3, 0.2, 0.4], np.float32)
    keep = np.asarray(nms_mask(yx_min, yx_max, scores, 0.45))
    assert keep.sum() == 1 and keep[1]
