"""Golden tests for the region head decode (SURVEY.md §2.9 formulas)."""

import numpy as np
import pytest

from yolojax.ops.decode import decode, decode_flat


def sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


@pytest.fixture
def tiny_head(rng):
    # 2x2 grid, 2 anchors, 3 classes → channels = 2*(5+3) = 16
    anchors = np.asarray([[1.0, 1.0], [2.0, 0.5]], dtype=np.float32)
    raw = rng.standard_normal((1, 2, 2, 16)).astype(np.float32)
    return raw, anchors


def test_decode_golden_single_cell():
    anchors = np.asarray([[2.0, 1.0]], dtype=np.float32)
    raw = np.zeros((1, 1, 1, 8), dtype=np.float32)
    raw[0, 0, 0, :5] = [0.0, 1.0, np.log(2.0), 0.0, 0.5]  # ty,tx,th,tw,to
    raw[0, 0, 0, 5:] = [0.0, np.log(3.0), 0.0]            # class logits
    det = decode(raw, anchors)
    # grid 1x1: center = sigmoid(t); size = anchor*exp(t_hw)
    cy, cx = sigmoid(0.0), sigmoid(1.0)
    sh, sw = 2.0 * 2.0, 1.0 * 1.0
    np.testing.assert_allclose(det.yx_min[0, 0], [cy - sh / 2, cx - sw / 2], rtol=1e-5)
    np.testing.assert_allclose(det.yx_max[0, 0], [cy + sh / 2, cx + sw / 2], rtol=1e-5)
    np.testing.assert_allclose(det.iou[0, 0], sigmoid(0.5), rtol=1e-5)
    np.testing.assert_allclose(det.prob[0, 0], [0.2, 0.6, 0.2], rtol=1e-5)
    np.testing.assert_allclose(det.conf[0, 0], sigmoid(0.5) * np.asarray([0.2, 0.6, 0.2]), rtol=1e-5)


def test_decode_grid_offsets(tiny_head):
    raw, anchors = tiny_head
    det = decode(raw, anchors)
    # reshape order: cell (y,x) major, anchor minor
    t = raw.reshape(1, 2, 2, 2, 8)
    centers = (np.asarray(det.yx_min) + np.asarray(det.yx_max)) / 2
    centers = centers.reshape(1, 2, 2, 2, 2)
    for y in range(2):
        for x in range(2):
            for a in range(2):
                want = (sigmoid(t[0, y, x, a, :2]) + [y, x]) / 2.0
                np.testing.assert_allclose(centers[0, y, x, a], want, rtol=1e-5)


def test_decode_probs_normalized(tiny_head):
    raw, anchors = tiny_head
    det = decode(raw, anchors)
    np.testing.assert_allclose(np.asarray(det.prob).sum(-1), 1.0, rtol=1e-5)
    assert det.yx_min.shape == (1, 8, 2)
    assert det.conf.shape == (1, 8, 3)


def test_decode_flat_packs(tiny_head):
    raw, anchors = tiny_head
    det = decode(raw, anchors)
    flat = np.asarray(decode_flat(raw, anchors))
    np.testing.assert_allclose(flat[..., :2], det.yx_min, rtol=1e-6)
    np.testing.assert_allclose(flat[..., 4], det.iou, rtol=1e-6)
    np.testing.assert_allclose(flat[..., 5:], det.conf, rtol=1e-6)
