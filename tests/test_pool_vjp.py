"""Custom max-pool VJP parity: the mask-based backward is bit-identical to
XLA's SelectAndScatter gradient (first-max-in-scan-order tie semantics).
It is NOT routed in max_pool — measured slower in-graph on TPU (DEVNOTES
round 3) — and is kept as the tie-semantics oracle for pool-backward
experiments (scripts/pool_bwd_variants.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolojax.models.blocks import _max_pool2x2, _rw_max2x2, max_pool


def _grads(fn, x, cot):
    y, vjp = jax.vjp(fn, x)
    (dx,) = vjp(cot)
    return y, dx


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_pool2x2_vjp_matches_reduce_window(dtype):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (3, 8, 12, 5)), dtype)
    cot = jnp.asarray(rng.normal(0, 1, (3, 4, 6, 5)), dtype)
    y1, d1 = _grads(_max_pool2x2, x, cot)
    y2, d2 = _grads(_rw_max2x2, x, cot)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_pool2x2_vjp_tie_semantics(dtype):
    """Windows with repeated maxima: gradient must go to the FIRST max in
    row-major order only, exactly as SelectAndScatter does."""
    rng = np.random.default_rng(1)
    # quantize to force many exact ties
    x = jnp.asarray(np.round(rng.normal(0, 1, (2, 16, 16, 3)) * 2) / 2, dtype)
    cot = jnp.asarray(rng.normal(0, 1, (2, 8, 8, 3)), dtype)
    _, d1 = _grads(_max_pool2x2, x, cot)
    _, d2 = _grads(_rw_max2x2, x, cot)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    # all-equal window: only position (0,0) receives gradient
    xe = jnp.ones((1, 2, 2, 1), dtype)
    ce = jnp.full((1, 1, 1, 1), 3.0, dtype)
    _, de = _grads(_max_pool2x2, xe, ce)
    np.testing.assert_array_equal(
        np.asarray(de)[0, :, :, 0], np.asarray([[3.0, 0.0], [0.0, 0.0]], de.dtype))


def test_max_pool_dispatch():
    """max_pool shapes and gradients across the darknet pool variants (the
    custom-VJP path is NOT routed — measured slower in-graph; it exists as
    a tie-semantics oracle only)."""
    x = jnp.ones((1, 6, 6, 2))
    assert max_pool(x).shape == (1, 3, 3, 2)
    odd = jnp.ones((1, 7, 7, 2))
    assert max_pool(odd).shape == (1, 3, 3, 2)
    s1 = jnp.ones((1, 13, 13, 2))
    assert max_pool(s1, 2, 1).shape == (1, 13, 13, 2)
    g = jax.grad(lambda x: max_pool(x, 2, 1).sum())(s1)
    assert g.shape == s1.shape
