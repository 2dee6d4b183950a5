#!/usr/bin/env python
"""Try alternative 2x2/2 max-pool implementations for the slow pool3 shape."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

REPEAT = 10


def time_fn(fn, *args, iters=20):
    out = fn(*args)
    float(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    float(outs[-1])
    return (time.perf_counter() - t0) / iters / REPEAT


def bench_op(make_body, x):
    @jax.jit
    def f(x):
        def body(acc, _):
            y = make_body(x + (acc * 1e-20).astype(x.dtype))
            return y.sum(dtype=jnp.float32), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=REPEAT)
        return acc
    return time_fn(f, x)


def pool_rw(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def pool_reshape(x):
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.max(axis=(2, 4))


def pool_slice(x):
    a = jnp.maximum(x[:, ::2, ::2], x[:, 1::2, ::2])
    b = jnp.maximum(x[:, ::2, 1::2], x[:, 1::2, 1::2])
    return jnp.maximum(a, b)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    rng = np.random.default_rng(0)
    shapes = [(batch, 416, 416, 32), (batch, 208, 208, 64),
              (batch, 104, 104, 128), (batch, 52, 52, 256), (batch, 26, 26, 512)]
    print(f"{'shape':>20} {'rw':>7} {'reshape':>8} {'slice':>7} {'roof':>7}")
    for shape in shapes:
        x = jax.device_put(rng.standard_normal(shape, np.float32)
                           .astype(jnp.bfloat16))
        r1 = bench_op(pool_rw, x) * 1e3
        r2 = bench_op(pool_reshape, x) * 1e3
        r3 = bench_op(pool_slice, x) * 1e3
        roof = (2 * np.prod(shape) * 1.25) / 819e9 * 1e3
        print(f"{str(shape):>20} {r1:7.3f} {r2:8.3f} {r3:7.3f} {roof:7.3f}")


if __name__ == "__main__":
    main()


def pool_1d1d(x):
    y = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                              (1, 2, 1, 1), (1, 2, 1, 1), "VALID")
    return jax.lax.reduce_window(y, -jnp.inf, jax.lax.max,
                                 (1, 1, 2, 1), (1, 1, 2, 1), "VALID")


def extra():
    rng = np.random.default_rng(0)
    for shape in [(128, 104, 104, 128), (128, 416, 416, 32)]:
        x = jax.device_put(rng.standard_normal(shape, np.float32)
                           .astype(jnp.bfloat16))
        r = bench_op(pool_1d1d, x) * 1e3
        print(f"1d1d {shape}: {r:.3f} ms")


if __name__ == "__main__" and os.environ.get("EXTRA"):
    extra()
