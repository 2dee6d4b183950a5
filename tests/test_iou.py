"""Golden tests for the IoU library (SURVEY.md §2.11 contract)."""

import numpy as np

from yolojax.ops.iou import (area, intersection, iou_matrix, iou_pairwise,
                             np_iou_matrix, wh_iou_matrix)


def boxes(*rows):
    arr = np.asarray(rows, dtype=np.float32)
    return arr[:, :2], arr[:, 2:]


def test_area():
    yx_min, yx_max = boxes([0, 0, 2, 3], [1, 1, 1, 5])
    np.testing.assert_allclose(area(yx_min, yx_max), [6.0, 0.0])


def test_area_clamps_negative_extent():
    yx_min, yx_max = boxes([2, 2, 1, 1])
    assert float(area(yx_min, yx_max)[0]) == 0.0


def test_iou_identity_and_disjoint():
    yx_min, yx_max = boxes([0, 0, 2, 2], [10, 10, 12, 12])
    m = np.asarray(iou_matrix(yx_min, yx_max, yx_min, yx_max))
    np.testing.assert_allclose(m, np.eye(2), atol=1e-6)


def test_iou_golden_half_overlap():
    # [0,0,2,2] vs [0,1,2,3]: inter=2, union=8-2=6 → 1/3
    a_min, a_max = boxes([0, 0, 2, 2])
    b_min, b_max = boxes([0, 1, 2, 3])
    m = iou_matrix(a_min, a_max, b_min, b_max)
    np.testing.assert_allclose(m, [[1 / 3]], rtol=1e-6)
    np.testing.assert_allclose(
        iou_pairwise(a_min, a_max, b_min, b_max), [1 / 3], rtol=1e-6)


def test_intersection_matrix_shape_and_values():
    a_min, a_max = boxes([0, 0, 4, 4], [2, 2, 6, 6])
    b_min, b_max = boxes([0, 0, 2, 2], [3, 3, 5, 5], [10, 10, 11, 11])
    inter = np.asarray(intersection(a_min, a_max, b_min, b_max))
    assert inter.shape == (2, 3)
    np.testing.assert_allclose(inter, [[4, 1, 0], [0, 4, 0]])


def test_numpy_mirror_matches_jax(rng):
    a = np.sort(rng.uniform(0, 10, (7, 2, 2)).astype(np.float32), axis=1)
    b = np.sort(rng.uniform(0, 10, (5, 2, 2)).astype(np.float32), axis=1)
    jx = np.asarray(iou_matrix(a[:, 0], a[:, 1], b[:, 0], b[:, 1]))
    npy = np_iou_matrix(a[:, 0], a[:, 1], b[:, 0], b[:, 1])
    np.testing.assert_allclose(jx, npy, rtol=1e-5)


def test_wh_iou_golden():
    # shape-only: (2,2) vs (1,4): inter=min(2,1)*min(2,4)=2, union=4+4-2=6
    hw1 = np.asarray([[2.0, 2.0]], dtype=np.float32)
    hw2 = np.asarray([[1.0, 4.0], [2.0, 2.0]], dtype=np.float32)
    m = np.asarray(wh_iou_matrix(hw1, hw2))
    np.testing.assert_allclose(m, [[1 / 3, 1.0]], rtol=1e-6)
