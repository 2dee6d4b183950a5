#!/usr/bin/env python
"""Per-layer MobileNet profile: XLA dw conv (+BN'd epilogue) vs roofline.

Depthwise convs are memory-bound (9 FLOPs/elem); the question is whether
XLA's grouped-conv lowering reaches the HBM bound, and whether the 1x1
pointwise convs (the FLOP carriers) reach the MXU bound.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

PEAK_TF = 197e12
PEAK_BW = 819e9
REPEAT = 10


def time_fn(fn, *args, iters=15):
    out = fn(*args)
    float(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    float(outs[-1])
    return (time.perf_counter() - t0) / iters / REPEAT


def dw_layer(c, stride):
    @jax.jit
    def f(x, w, b):
        def body(acc, _):
            y = jax.lax.conv_general_dilated(
                x + (acc * 1e-20).astype(x.dtype), w, (stride, stride),
                ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=c)
            y = jnp.where(y >= 0, y + b, 0.1 * (y + b)).astype(jnp.bfloat16)
            return y.sum(dtype=jnp.float32), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=REPEAT)
        return acc
    return f


def pw_layer(cin, cout):
    @jax.jit
    def f(x, w, b):
        def body(acc, _):
            y = jax.lax.conv_general_dilated(
                x + (acc * 1e-20).astype(x.dtype), w, (1, 1), ((0, 0), (0, 0)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = jnp.where(y >= 0, y + b, 0.1 * (y + b)).astype(jnp.bfloat16)
            return y.sum(dtype=jnp.float32), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=REPEAT)
        return acc
    return f


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    blocks = [(64, 1), (128, 2), (128, 1), (256, 2), (256, 1), (512, 2),
              (512, 1), (512, 1), (512, 1), (512, 1), (512, 1), (1024, 2), (1024, 1)]
    rng = np.random.default_rng(0)
    sp, cin = 208, 32
    total = rtotal = 0.0
    print(f"{'layer':>6} {'HxW':>7} {'cin':>5} {'cout':>5} {'ms':>7} {'roof':>7} {'eff%':>5}")
    for i, (cout, stride) in enumerate(blocks, 1):
        # depthwise
        x = jax.device_put(rng.standard_normal((batch, sp, sp, cin), np.float32)
                           .astype(jnp.bfloat16))
        w = jax.device_put((rng.standard_normal((3, 3, 1, cin), np.float32) * 0.1)
                           .astype(jnp.bfloat16))
        b = jax.device_put(np.zeros((cin,), np.float32))
        ms = time_fn(dw_layer(cin, stride), x, w, b) * 1e3
        so = sp // stride
        flops = 2 * batch * so * so * cin * 9
        bytes_ = 2 * batch * (sp * sp + so * so) * cin
        roof = max(flops / PEAK_TF, bytes_ / PEAK_BW) * 1e3
        total += ms; rtotal += roof
        print(f"dw{i:<4} {sp:>4}x{sp:<3} {cin:>5} {cin:>5} {ms:7.3f} {roof:7.3f} {roof/ms*100:5.0f}")
        sp = so
        # pointwise
        x = jax.device_put(rng.standard_normal((batch, sp, sp, cin), np.float32)
                           .astype(jnp.bfloat16))
        w = jax.device_put((rng.standard_normal((1, 1, cin, cout), np.float32) * 0.1)
                           .astype(jnp.bfloat16))
        b = jax.device_put(np.zeros((cout,), np.float32))
        ms = time_fn(pw_layer(cin, cout), x, w, b) * 1e3
        flops = 2 * batch * sp * sp * cin * cout
        bytes_ = 2 * batch * sp * sp * (cin + cout) + 2 * cin * cout
        roof = max(flops / PEAK_TF, bytes_ / PEAK_BW) * 1e3
        total += ms; rtotal += roof
        print(f"pw{i:<4} {sp:>4}x{sp:<3} {cin:>5} {cout:>5} {ms:7.3f} {roof:7.3f} {roof/ms*100:5.0f}")
        cin = cout
    print(f"{'TOTAL':>6} {'':>25} {total:7.2f} {rtotal:7.2f} {rtotal/total*100:5.0f}")


if __name__ == "__main__":
    main()
