"""Reorg ordering test against the explicit darknet formula (SURVEY.md §2.6).

The contract (derived from the reference's view/permute chain,
``model/yolo2.py: reorg`` (recon), expressed in NHWC):
    out[b, hi, wi, (p*s + q)*C + c] = in[b, hi*s + p, wi*s + q, c]
"""

import numpy as np

from yolojax.ops.reorg import reorg


def reference_reorg(x, s):
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


def test_reorg_matches_explicit_formula(rng):
    x = rng.standard_normal((2, 6, 4, 3)).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(reorg(x, 2)), reference_reorg(x, 2))


def test_reorg_stride3(rng):
    x = rng.standard_normal((1, 6, 6, 2)).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(reorg(x, 3)), reference_reorg(x, 3))


def test_reorg_yolo_shapes(rng):
    x = rng.standard_normal((2, 26, 26, 64)).astype(np.float32)
    assert reorg(x, 2).shape == (2, 13, 13, 256)


def test_reorg_rejects_indivisible():
    import pytest
    with pytest.raises(ValueError):
        reorg(np.zeros((1, 5, 4, 1), np.float32), 2)
