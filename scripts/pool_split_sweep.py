#!/usr/bin/env python
"""Per-shape 2-D vs split 1-D reduce_window maxpool (VERDICT r2 #5).

Round 2 measured pool3 (104²×128) at 24% of its memory bound with the 2-D
reduce_window and found a two-pass 1-D split ran 1.84 vs 2.48 ms — but
regressed pool1 3× — and didn't take it.  This sweep measures fwd AND
backward for both formulations at every darknet pool shape so max_pool can
dispatch per shape on data rather than a blanket choice.

    setsid nohup python -u scripts/pool_split_sweep.py > /tmp/poolsplit.log &
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

REPEAT = 4
B = 128
POOLS = [(416, 32), (208, 64), (104, 128), (52, 256), (26, 512), (13, 1024)]


def time_fn(fn, *args, iters=6):
    out = fn(*args)
    float(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    float(outs[-1])
    return (time.perf_counter() - t0) / iters / REPEAT * 1e3


def pool2d(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def pool_split(x):
    y = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                              (1, 2, 1, 1), (1, 2, 1, 1), "VALID")
    return jax.lax.reduce_window(y, -jnp.inf, jax.lax.max,
                                 (1, 1, 2, 1), (1, 1, 2, 1), "VALID")


def make_fwd(f):
    @jax.jit
    def run(x):
        def body(acc, _):
            y = f(x + (acc * 1e-20).astype(x.dtype))
            return jnp.sum(y, dtype=jnp.float32) * 1e-12, None
        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=REPEAT)
        return acc
    return run


def make_vjp(f):
    @jax.jit
    def run(x, g):
        def body(acc, _):
            _, vjp = jax.vjp(f, x + (acc * 1e-20).astype(x.dtype))
            (dx,) = vjp(g)
            return jnp.sum(dx, dtype=jnp.float32) * 1e-12, None
        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=REPEAT)
        return acc
    return run


def main():
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    f2, v2 = make_fwd(pool2d), make_vjp(pool2d)
    fs, vs = make_fwd(pool_split), make_vjp(pool_split)
    for size, ch in POOLS:
        x = jax.device_put(rng.uniform(-1, 1, (B, size, size, ch))
                           .astype(np.float32)).astype(dt)
        g = jax.device_put(rng.uniform(-1, 1, (B, size // 2, size // 2, ch))
                           .astype(np.float32)).astype(dt)
        a = time_fn(f2, x)
        b = time_fn(v2, x, g) - a
        c = time_fn(fs, x)
        d = time_fn(vs, x, g) - c
        print(f"pool {size:4d}²×{ch:4d}: 2d fwd {a:6.2f} bwd {b:6.2f} | "
              f"split fwd {c:6.2f} bwd {d:6.2f} ms", flush=True)

    # parity: split == 2d exactly (max is associative; no ties issue for fwd)
    xs = jnp.asarray(np.random.default_rng(1).normal(0, 1, (2, 8, 8, 3)), jnp.float32)
    assert jnp.array_equal(pool2d(xs), pool_split(xs))
    print("parity fwd OK", flush=True)


if __name__ == "__main__":
    main()
