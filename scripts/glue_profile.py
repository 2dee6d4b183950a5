#!/usr/bin/env python
"""Profile the non-conv ops in the Darknet forward: maxpools, reorg, concat.

Companion to conv_profile.py — locates the fused-forward time that the convs
themselves (82% of roofline in isolation) do not account for.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

PEAK_BW = 819e9
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


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    rng = np.random.default_rng(0)

    from yolojax.models.blocks import max_pool
    from yolojax.ops.reorg import reorg

    cases = [
        ("pool1", (batch, 416, 416, 32), lambda x: max_pool(x, 2, 2)),
        ("pool2", (batch, 208, 208, 64), lambda x: max_pool(x, 2, 2)),
        ("pool3", (batch, 104, 104, 128), lambda x: max_pool(x, 2, 2)),
        ("pool4", (batch, 52, 52, 256), lambda x: max_pool(x, 2, 2)),
        ("pool5", (batch, 26, 26, 512), lambda x: max_pool(x, 2, 2)),
        ("reorgD", (batch, 26, 26, 64), lambda x: reorg(x, 2, "darknet")),
        ("reorgS", (batch, 26, 26, 64), lambda x: reorg(x, 2, "s2d")),
        ("cast", (batch, 416, 416, 3), lambda x: x.astype(jnp.bfloat16)),
        ("concat", (batch, 13, 13, 1024),
         lambda x: jnp.concatenate([x, x[..., :256]], -1)),
    ]
    print(f"{'op':>7} {'shape':>20} {'ms':>7} {'roofms':>7} {'eff%':>5}")
    total = 0.0
    for name, shape, body in cases:
        dt = jnp.float32 if name == "cast" else jnp.bfloat16
        x = jax.device_put(rng.standard_normal(shape, np.float32).astype(dt))
        ms = bench_op(body, x) * 1e3
        nbytes = int(np.prod(shape))
        if name.startswith("pool"):
            bytes_ = 2 * nbytes + 2 * nbytes // 4
        elif name == "cast":
            bytes_ = 4 * nbytes + 2 * nbytes
        elif name == "concat":
            bytes_ = 2 * nbytes * 2 + 2 * nbytes // 2
        else:
            bytes_ = 2 * nbytes * 2
        roof = bytes_ / PEAK_BW * 1e3
        total += ms
        print(f"{name:>7} {str(shape):>20} {ms:7.3f} {roof:7.3f} {roof/ms*100:5.0f}")
    print(f"{'TOTAL':>7} {'':>20} {total:7.3f}")


if __name__ == "__main__":
    main()
