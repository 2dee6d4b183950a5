"""VOC AP protocol tests (SURVEY.md §2.14): hand-computed golden cases."""

import numpy as np

from yolojax.eval_ap import DetectionRecorder, evaluate, voc_ap


def test_voc_ap_perfect_curve():
    r = np.asarray([0.5, 1.0])
    p = np.asarray([1.0, 1.0])
    np.testing.assert_allclose(voc_ap(r, p, use_07_metric=True), 1.0)
    np.testing.assert_allclose(voc_ap(r, p, use_07_metric=False), 1.0)


def test_voc_ap_11_point_vs_continuous():
    # one TP then one FP: recall [1.0, 1.0], precision [1.0, 0.5] (npos=1)
    r = np.asarray([1.0, 1.0])
    p = np.asarray([1.0, 0.5])
    np.testing.assert_allclose(voc_ap(r, p, True), 1.0)
    np.testing.assert_allclose(voc_ap(r, p, False), 1.0)
    # TP at rank 2 of 2: recall [0,1], precision [0, 0.5]
    r = np.asarray([0.0, 1.0])
    p = np.asarray([0.0, 0.5])
    # 11pt: recalls 0..1 all have max precision 0.5 from the envelope → 0.5
    np.testing.assert_allclose(voc_ap(r, p, True), 0.5)
    np.testing.assert_allclose(voc_ap(r, p, False), 0.5)


def box(y0, x0, y1, x1):
    return np.asarray([[y0, x0]]), np.asarray([[y1, x1]])


def test_single_class_tp_fp_counting():
    rec = DetectionRecorder(1)
    gmin = np.asarray([[0.0, 0.0], [0.5, 0.5]])
    gmax = np.asarray([[0.4, 0.4], [0.9, 0.9]])
    rec.add_ground_truth("img0", gmin, gmax, np.asarray([0, 0]),
                         np.asarray([False, False]))
    # det1: perfect match of gt0; det2: total miss; det3: duplicate of gt0
    rec.add_detections("img0", np.asarray([[0.0, 0.0]]), np.asarray([[0.4, 0.4]]),
                       np.asarray([0.9]), np.asarray([0]))
    rec.add_detections("img0", np.asarray([[0.0, 0.6]]), np.asarray([[0.2, 0.9]]),
                       np.asarray([0.8]), np.asarray([0]))
    rec.add_detections("img0", np.asarray([[0.01, 0.0]]), np.asarray([[0.41, 0.4]]),
                       np.asarray([0.7]), np.asarray([0]))
    res = evaluate(rec, iou_threshold=0.5, use_07_metric=False)
    # npos=2; ranks: TP, FP, FP(dup) → recall [.5,.5,.5], prec [1,.5,.33]
    np.testing.assert_allclose(res["map"], 0.5)


def test_difficult_gts_are_ignored():
    rec = DetectionRecorder(1)
    rec.add_ground_truth("img0", np.asarray([[0.0, 0.0], [0.5, 0.5]]),
                         np.asarray([[0.4, 0.4], [0.9, 0.9]]),
                         np.asarray([0, 0]), np.asarray([False, True]))
    # detection matching the difficult gt must not count as TP or FP
    rec.add_detections("img0", np.asarray([[0.5, 0.5]]), np.asarray([[0.9, 0.9]]),
                       np.asarray([0.9]), np.asarray([0]))
    # detection matching the easy gt is a TP; npos = 1 (difficult excluded)
    rec.add_detections("img0", np.asarray([[0.0, 0.0]]), np.asarray([[0.4, 0.4]]),
                       np.asarray([0.8]), np.asarray([0]))
    res = evaluate(rec, use_07_metric=False)
    np.testing.assert_allclose(res["map"], 1.0)


def test_multiclass_map_averages():
    rec = DetectionRecorder(3)
    for img in ("a", "b"):
        rec.add_ground_truth(img, np.asarray([[0.0, 0.0]]), np.asarray([[0.5, 0.5]]),
                             np.asarray([0]), np.asarray([False]))
    rec.add_ground_truth("a", np.asarray([[0.5, 0.5]]), np.asarray([[1.0, 1.0]]),
                         np.asarray([1]), np.asarray([False]))
    # class 0: perfect on both images; class 1: missed entirely (one FP);
    # class 2: no gts, no dets → excluded from the mean
    for img in ("a", "b"):
        rec.add_detections(img, np.asarray([[0.0, 0.0]]), np.asarray([[0.5, 0.5]]),
                           np.asarray([0.9]), np.asarray([0]))
    rec.add_detections("b", np.asarray([[0.5, 0.5]]), np.asarray([[1.0, 1.0]]),
                       np.asarray([0.9]), np.asarray([1]))
    res = evaluate(rec, use_07_metric=False)
    np.testing.assert_allclose(res["ap"][0], 1.0)
    np.testing.assert_allclose(res["ap"][1], 0.0)
    assert 2 not in res["ap"]
    np.testing.assert_allclose(res["map"], 0.5)


def test_detection_in_gtless_image_is_fp():
    rec = DetectionRecorder(1)
    rec.add_ground_truth("a", np.asarray([[0.0, 0.0]]), np.asarray([[0.5, 0.5]]),
                         np.asarray([0]), np.asarray([False]))
    rec.add_detections("a", np.asarray([[0.0, 0.0]]), np.asarray([[0.5, 0.5]]),
                       np.asarray([0.9]), np.asarray([0]))
    rec.add_detections("zzz-no-gt", np.asarray([[0.0, 0.0]]), np.asarray([[0.5, 0.5]]),
                       np.asarray([0.95]), np.asarray([0]))
    res = evaluate(rec, use_07_metric=False)
    # FP at rank 1, TP at rank 2: recall [0,1], precision [0,.5] → 0.5
    np.testing.assert_allclose(res["map"], 0.5)


# --- COCO protocol (evaluate_coco / ap_101pt) ---------------------------------

def _box(y, x, h=0.2, w=0.2):
    return np.asarray([[y, x]]), np.asarray([[y + h, x + w]])


def test_ap_101pt_hand_computed():
    from yolojax.eval_ap import ap_101pt

    # 3 dets: TP, FP, TP over 2 positives → recall [.5, .5, 1],
    # precision [1, .5, 2/3].  Envelope: [1, 2/3, 2/3].
    # 101-pt: r<=0.5 → 1.0 (51 pts), 0.51..1.0 → 2/3 (50 pts)
    recall = np.asarray([0.5, 0.5, 1.0])
    precision = np.asarray([1.0, 0.5, 2 / 3])
    want = (51 * 1.0 + 50 * (2 / 3)) / 101.0
    np.testing.assert_allclose(ap_101pt(recall, precision), want, rtol=1e-12)


def test_ap_101pt_truncated_recall():
    from yolojax.eval_ap import ap_101pt

    # recall never reaches 0.6 → points above get 0
    recall = np.asarray([0.25, 0.5])
    precision = np.asarray([1.0, 1.0])
    want = 51 / 101.0  # r in {0,...,0.50}
    np.testing.assert_allclose(ap_101pt(recall, precision), want, rtol=1e-12)


def test_coco_matching_takes_next_best_unmatched_gt():
    """Two dets whose best-IoU gt coincides: VOC counts the 2nd a duplicate
    FP; COCO matches it to the next-best gt above threshold."""
    from yolojax.eval_ap import evaluate_coco

    rec = DetectionRecorder(1)
    g1 = _box(0.0, 0.0)        # gt A
    g2 = _box(0.0, 0.12)       # gt B overlaps A's region
    rec.add_ground_truth("i", np.concatenate([g1[0], g2[0]]),
                         np.concatenate([g1[1], g2[1]]),
                         np.asarray([0, 0]), np.asarray([False, False]))
    # both dets sit exactly on gt A; the 2nd overlaps B at IoU ~0.33
    d = _box(0.0, 0.04)
    rec.add_detections("i", np.concatenate([g1[0], d[0]]),
                       np.concatenate([g1[1], d[1]]),
                       np.asarray([0.9, 0.8]), np.asarray([0, 0]))
    res = evaluate_coco(rec, iou_thresholds=[0.3])
    np.testing.assert_allclose(res["map"], 1.0)   # both TP under COCO
    res_voc = evaluate(rec, iou_threshold=0.3, use_07_metric=False)
    assert res_voc["map"] < 1.0                   # VOC: duplicate → FP


def test_coco_crowd_gt_ignores_detection():
    from yolojax.eval_ap import evaluate_coco

    rec = DetectionRecorder(1)
    gmin, gmax = _box(0.0, 0.0)
    cmin, cmax = _box(0.5, 0.5, 0.4, 0.4)  # crowd region
    rec.add_ground_truth("i", np.concatenate([gmin, cmin]),
                         np.concatenate([gmax, cmax]),
                         np.asarray([0, 0]), np.asarray([False, True]))
    rec.add_detections("i", np.concatenate([gmin, cmin]),
                       np.concatenate([gmax, cmax]),
                       np.asarray([0.9, 0.8]), np.asarray([0, 0]))
    res = evaluate_coco(rec, iou_thresholds=[0.5])
    # det 2 falls in the crowd region → dropped, not FP; AP stays 1.0
    np.testing.assert_allclose(res["map"], 1.0)


def test_coco_crowd_overlap_is_intersection_over_det_area():
    """pycocotools iscrowd semantics: a small detection fully inside a large
    crowd region has tiny union-IoU but intersection/det-area = 1 → must be
    ignored, not counted FP (ADVICE r2, medium)."""
    from yolojax.eval_ap import evaluate_coco

    rec = DetectionRecorder(1)
    gmin, gmax = _box(0.0, 0.0)                       # one real gt
    cmin, cmax = _box(0.4, 0.4, 0.5, 0.5)             # big crowd region
    rec.add_ground_truth("i", np.concatenate([gmin, cmin]),
                         np.concatenate([gmax, cmax]),
                         np.asarray([0, 0]), np.asarray([False, True]))
    # TP on the real gt + a tiny det inside the crowd (union IoU ~0.016)
    dmin, dmax = _box(0.55, 0.55, 0.05, 0.05)
    rec.add_detections("i", np.concatenate([gmin, dmin]),
                       np.concatenate([gmax, dmax]),
                       np.asarray([0.9, 0.8]), np.asarray([0, 0]))
    res = evaluate_coco(rec, iou_thresholds=[0.5])
    np.testing.assert_allclose(res["map"], 1.0)       # crowd det ignored


def test_coco_npos_zero_class_excluded_even_with_fps():
    """A class with detections but no gt anywhere must be excluded from the
    mean (pycocotools AP=-1), not scored 0 (ADVICE r2, low)."""
    from yolojax.eval_ap import evaluate_coco

    rec = DetectionRecorder(2)
    gmin, gmax = _box(0.0, 0.0)
    rec.add_ground_truth("i", gmin, gmax, np.asarray([0]), np.asarray([False]))
    rec.add_detections("i", gmin, gmax, np.asarray([0.9]), np.asarray([0]))
    # class 1: a false positive but zero gts in the whole split
    rec.add_detections("i", gmin, gmax, np.asarray([0.8]), np.asarray([1]))
    res = evaluate_coco(rec, iou_thresholds=[0.5])
    np.testing.assert_allclose(res["map"], 1.0)
    assert 1 not in res["ap"][0.5]
    # same consistency on the VOC side
    res_voc = evaluate(rec, use_07_metric=False)
    assert 1 not in res_voc["ap"]
    np.testing.assert_allclose(res_voc["map"], 1.0)


def test_coco_max_dets_cap_per_image():
    """pycocotools maxDets=100: COCOeval.evaluateImg truncates each
    (image, category) det list to the top-100 by score (ADVICE r2, low)."""
    from yolojax.eval_ap import evaluate_coco

    rec = DetectionRecorder(1)
    gmin, gmax = _box(0.0, 0.0)
    rec.add_ground_truth("i", gmin, gmax, np.asarray([0]), np.asarray([False]))
    # the TP at LOW confidence + 100 higher-confidence FPs: with the cap the
    # TP is evicted (rank 101) → AP 0; without it AP would be > 0
    rec.add_detections("i", gmin, gmax, np.asarray([0.01]), np.asarray([0]))
    far = _box(0.7, 0.7, 0.05, 0.05)
    for k in range(100):
        rec.add_detections("i", far[0], far[1],
                           np.asarray([0.5 + k * 1e-3]), np.asarray([0]))
    res = evaluate_coco(rec, iou_thresholds=[0.5])
    np.testing.assert_allclose(res["map"], 0.0)
    res_uncapped = evaluate_coco(rec, iou_thresholds=[0.5], max_dets=1000)
    assert res_uncapped["map"] > 0.0


def test_coco_max_dets_cap_is_per_category():
    """The cap is per (image, category), NOT per image across classes: a
    class's sole TP survives 100 higher-confidence dets of ANOTHER class in
    the same image (pycocotools evaluateImg truncates dt per imgId,catId)."""
    from yolojax.eval_ap import evaluate_coco

    rec = DetectionRecorder(2)
    gmin, gmax = _box(0.0, 0.0)
    rec.add_ground_truth("i", gmin, gmax, np.asarray([1]), np.asarray([False]))
    # class 1's TP at low confidence
    rec.add_detections("i", gmin, gmax, np.asarray([0.01]), np.asarray([1]))
    # 100 class-0 dets at higher confidence in the same image (all FPs for
    # class 0, which has no gt anywhere → class 0 excluded from the mean)
    far = _box(0.7, 0.7, 0.05, 0.05)
    for k in range(100):
        rec.add_detections("i", far[0], far[1],
                           np.asarray([0.5 + k * 1e-3]), np.asarray([0]))
    res = evaluate_coco(rec, iou_thresholds=[0.5])
    # an across-class cap would evict the class-1 TP (rank 101) → AP 0
    np.testing.assert_allclose(res["map"], 1.0)


def test_coco_ap_averages_over_iou_thresholds():
    from yolojax.eval_ap import evaluate_coco

    rec = DetectionRecorder(1)
    gmin, gmax = _box(0.0, 0.0, 0.4, 0.4)
    rec.add_ground_truth("i", gmin, gmax, np.asarray([0]), np.asarray([False]))
    # det shifted: IoU = (0.3*0.4)/(2*0.16 - 0.12) = 0.6 → TP for thr <= 0.6
    rec.add_detections("i", np.asarray([[0.1, 0.0]]), np.asarray([[0.5, 0.4]]),
                       np.asarray([0.9]), np.asarray([0]))
    res = evaluate_coco(rec)
    # thresholds 0.5..0.6 hit (3 of 10), 0.65+ miss
    np.testing.assert_allclose(res["map"], 0.3, atol=1e-9)
    np.testing.assert_allclose(res["map_50"], 1.0)
    np.testing.assert_allclose(res["map_75"], 0.0)
    assert set(res["ap"]) == {round(0.5 + i * 0.05, 2) for i in range(10)}
