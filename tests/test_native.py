"""Native C++ NMS: exact parity with the JAX reference implementation."""

import numpy as np
import pytest

from yolojax.native import native_nms_available, nms_native, nms_native_batch
from yolojax.ops.nms import nms_select

pytestmark = pytest.mark.skipif(not native_nms_available(),
                                reason="no C++ toolchain")


def random_boxes(rng, n):
    center = rng.uniform(0.2, 0.8, (n, 2)).astype(np.float32)
    half = rng.uniform(0.05, 0.2, (n, 2)).astype(np.float32)
    return center - half, center + half


def test_native_matches_jax_select(rng):
    for trial in range(8):
        n = 80
        yx_min, yx_max = random_boxes(rng, n)
        scores = rng.uniform(0, 1, n).astype(np.float32)
        gi, gc, gv = nms_native(yx_min, yx_max, scores, 0.3, 0.45, n)
        ri, rc, rv = nms_select(yx_min, yx_max, scores, 0.3, 0.45, n)
        k = int(np.asarray(rv).sum())
        assert int(gv.sum()) == k
        np.testing.assert_array_equal(gi[:k], np.asarray(ri)[:k])
        np.testing.assert_allclose(gc[:k], np.asarray(rc)[:k], rtol=1e-6)


def test_native_batch_parallel(rng):
    g, n = 16, 50
    boxes = np.zeros((g, n, 4), np.float32)
    scores = rng.uniform(0, 1, (g, n)).astype(np.float32)
    for k in range(g):
        mn, mx = random_boxes(rng, n)
        boxes[k, :, :2], boxes[k, :, 2:] = mn, mx
    idx, conf, count = nms_native_batch(boxes, scores, 0.3, 0.45, 20)
    for k in range(g):
        ri, rc, rv = nms_select(boxes[k, :, :2], boxes[k, :, 2:], scores[k],
                                0.3, 0.45, 20)
        kk = int(np.asarray(rv).sum())
        assert count[k] == kk
        np.testing.assert_array_equal(idx[k, :kk], np.asarray(ri)[:kk])


def test_native_threshold_and_max_out(rng):
    n = 30
    yx_min, yx_max = random_boxes(rng, n)
    yx_min += np.arange(n)[:, None]  # disjoint boxes
    yx_max += np.arange(n)[:, None]
    scores = np.linspace(0.9, 0.05, n).astype(np.float32)
    idx, conf, valid = nms_native(yx_min, yx_max, scores, 0.5, 0.45, 10)
    # only scores > 0.5 survive, capped at 10
    expect = min(int((scores > 0.5).sum()), 10)
    assert int(valid.sum()) == expect
    assert np.all(np.diff(conf[:expect]) <= 0)
