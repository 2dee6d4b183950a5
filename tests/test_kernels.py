"""Pallas kernel parity tests — interpret mode on CPU, exact contracts
against the pure-XLA reference ops."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from yolojax.ops.nms import nms_select
from yolojax.ops.reorg import reorg_s2d


@pytest.fixture(autouse=True)
def interpret_mode():
    with pltpu.force_tpu_interpret_mode():
        yield


def test_reorg_pallas_matches_reference(rng):
    from yolojax.kernels.reorg import reorg_pallas

    x = rng.standard_normal((2, 8, 8, 16)).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(reorg_pallas(jnp.asarray(x), 2)),
                                  np.asarray(reorg_s2d(x, 2)))


def test_reorg_pallas_yolo_shape(rng):
    from yolojax.kernels.reorg import reorg_pallas

    x = rng.standard_normal((1, 26, 26, 64)).astype(np.float32)
    got = np.asarray(reorg_pallas(jnp.asarray(x), 2))
    assert got.shape == (1, 13, 13, 256)
    np.testing.assert_array_equal(got, np.asarray(reorg_s2d(x, 2)))


def test_nms_pallas_matches_reference(rng):
    from yolojax.kernels.nms import nms_select_pallas

    n, max_out = 64, 16
    center = rng.uniform(0.2, 0.8, (n, 2)).astype(np.float32)
    half = rng.uniform(0.05, 0.2, (n, 2)).astype(np.float32)
    yx_min, yx_max = center - half, center + half
    scores = rng.uniform(0, 1, n).astype(np.float32)

    ref_idx, ref_conf, ref_valid = nms_select(yx_min, yx_max, scores, 0.3, 0.45, max_out)
    idx, conf, valid = nms_select_pallas(jnp.asarray(yx_min), jnp.asarray(yx_max),
                                         jnp.asarray(scores), 0.3, 0.45, max_out)
    np.testing.assert_array_equal(np.asarray(valid), np.asarray(ref_valid))
    k = int(np.asarray(ref_valid).sum())
    np.testing.assert_array_equal(np.asarray(idx)[:k], np.asarray(ref_idx)[:k])
    np.testing.assert_allclose(np.asarray(conf)[:k], np.asarray(ref_conf)[:k], rtol=1e-6)


def test_nms_pallas_batched_grid(rng):
    from yolojax.kernels.nms import nms_select_pallas

    b, c, n, max_out = 2, 3, 40, 8
    center = rng.uniform(0.2, 0.8, (b, c, n, 2)).astype(np.float32)
    half = rng.uniform(0.05, 0.2, (b, c, n, 2)).astype(np.float32)
    yx_min, yx_max = center - half, center + half
    scores = rng.uniform(0, 1, (b, c, n)).astype(np.float32)
    idx, conf, valid = nms_select_pallas(jnp.asarray(yx_min), jnp.asarray(yx_max),
                                         jnp.asarray(scores), 0.3, 0.45, max_out)
    assert idx.shape == (b, c, max_out)
    for bi in range(b):
        for ci in range(c):
            ri, rc, rv = nms_select(yx_min[bi, ci], yx_max[bi, ci], scores[bi, ci],
                                    0.3, 0.45, max_out)
            np.testing.assert_array_equal(np.asarray(valid[bi, ci]), np.asarray(rv))
            k = int(np.asarray(rv).sum())
            np.testing.assert_array_equal(np.asarray(idx[bi, ci])[:k],
                                          np.asarray(ri)[:k])


def _dw_reference(x, w, stride):
    # symmetric k//2 padding, matching blocks._conv (darknet/torch semantics)
    return jax.lax.conv_general_dilated(
        x, w.reshape(3, 3, 1, -1), (stride, stride), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1])


@pytest.mark.parametrize("stride,shape", [(1, (1, 16, 16, 8)), (2, (2, 16, 16, 8)),
                                          (1, (1, 13, 13, 8)), (2, (1, 13, 13, 8))])
def test_dwconv_pallas_matches_lax(rng, stride, shape):
    from yolojax.kernels.dwconv import dwconv3x3_pallas

    x = rng.standard_normal(shape).astype(np.float32)
    w = rng.standard_normal((3, 3, shape[-1])).astype(np.float32)
    got = np.asarray(dwconv3x3_pallas(jnp.asarray(x), jnp.asarray(w), stride))
    want = np.asarray(_dw_reference(jnp.asarray(x), jnp.asarray(w), stride))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_postprocess_pallas_matches_xla(rng):
    from yolojax.kernels.nms import postprocess_pallas
    from yolojax.ops.decode import Detections
    from yolojax.ops.postprocess import postprocess

    b, n, c = 2, 45, 5
    center = rng.uniform(0.2, 0.8, (b, n, 2)).astype(np.float32)
    half = rng.uniform(0.05, 0.2, (b, n, 2)).astype(np.float32)
    conf = rng.uniform(0, 1, (b, n, c)).astype(np.float32) ** 3
    iou = rng.uniform(0, 1, (b, n)).astype(np.float32)
    det = Detections(jnp.asarray(center - half), jnp.asarray(center + half),
                     jnp.asarray(iou), jnp.asarray(conf), jnp.asarray(conf))
    a = postprocess(det, 0.05, 0.45, 10)
    p = postprocess_pallas(det, 0.05, 0.45, 10)
    np.testing.assert_array_equal(np.asarray(a.keep), np.asarray(p.keep))
    keep = np.asarray(a.keep)
    np.testing.assert_allclose(np.where(keep, np.asarray(a.conf), 0),
                               np.where(keep, np.asarray(p.conf), 0), rtol=1e-6)
    np.testing.assert_allclose(np.where(keep[..., None], np.asarray(a.yx_min), 0),
                               np.where(keep[..., None], np.asarray(p.yx_min), 0),
                               rtol=1e-6)
