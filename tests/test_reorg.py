"""Reorg ordering tests against explicit element-wise formulas (SURVEY.md
§2.6).

``reorg_s2d`` is pinned to the clean offset-major contract (the reference's
view/permute chain, ``model/yolo2.py: reorg`` (recon), expressed in NHWC):
    out[b, hi, wi, (p*s + q)*C + c] = in[b, hi*s + p, wi*s + q, c]
``reorg_darknet`` (the default; true darknet ``reorg_cpu`` semantics) is
pinned against the literal C-loop oracle in tests/test_reorg_oracle.py.
"""

import numpy as np
import pytest

from yolojax.ops.reorg import reorg, reorg_darknet, reorg_s2d


def reference_s2d(x, s):
    b, h, w, c = x.shape
    out = np.zeros((b, h // s, w // s, s * s * c), dtype=x.dtype)
    for bi in range(b):
        for hi in range(h // s):
            for wi in range(w // s):
                for p in range(s):
                    for q in range(s):
                        for ci in range(c):
                            out[bi, hi, wi, (p * s + q) * c + ci] = x[bi, hi * s + p, wi * s + q, ci]
    return out


def test_s2d_matches_explicit_formula(rng):
    x = rng.standard_normal((2, 6, 4, 3)).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(reorg_s2d(x, 2)), reference_s2d(x, 2))


def test_s2d_stride3(rng):
    x = rng.standard_normal((1, 6, 6, 2)).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(reorg_s2d(x, 3)), reference_s2d(x, 3))


def test_reorg_yolo_shapes(rng):
    x = rng.standard_normal((2, 26, 26, 64)).astype(np.float32)
    assert reorg_s2d(x, 2).shape == (2, 13, 13, 256)
    assert reorg_darknet(x, 2).shape == (2, 13, 13, 256)


def test_reorg_dispatch():
    x = np.arange(1 * 4 * 4 * 8, dtype=np.float32).reshape(1, 4, 4, 8)
    np.testing.assert_array_equal(np.asarray(reorg(x, 2)),
                                  np.asarray(reorg_darknet(x, 2)))
    np.testing.assert_array_equal(np.asarray(reorg(x, 2, "s2d")),
                                  np.asarray(reorg_s2d(x, 2)))
    with pytest.raises(ValueError, match="unknown reorg order"):
        reorg(x, 2, "bogus")


def test_reorg_rejects_indivisible():
    with pytest.raises(ValueError):
        reorg_s2d(np.zeros((1, 5, 4, 1), np.float32), 2)
    with pytest.raises(ValueError):  # spatial
        reorg_darknet(np.zeros((1, 5, 4, 4), np.float32), 2)
    with pytest.raises(ValueError):  # darknet additionally needs C % s² == 0
        reorg_darknet(np.zeros((1, 4, 4, 3), np.float32), 2)
