#!/usr/bin/env python
"""Per-op backward decomposition on the real TPU (VERDICT r2 #1).

For each Darknet-19 layer shape, times forward-only vs VJP (fwd+bwd) of the
isolated op with the scan-repeat method, so bwd = vjp − fwd.  Ops covered:
conv blocks (dgrad+wgrad+BN+leaky together, then conv-only to split),
max-pools via ``reduce_window`` (suspect: SelectAndScatter backward) vs the
equivalent reshape-max at stride 2, and the BN normalize alone.

    setsid nohup python -u scripts/bwd_profile.py > /tmp/bwd.log &
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


def time_fn(fn, *args, iters=6):
    """fn must be a stable jitted callable (compile once, reuse)."""
    out = fn(*args)
    float(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    float(outs[-1])
    return (time.perf_counter() - t0) / iters / REPEAT * 1e3  # ms


def make_scan_fwd(f, n_rest):
    """Jitted scan-repeat of f(x, *rest); one compile per (f, shapes)."""
    @jax.jit
    def run(x, *rest):
        def body(acc, _):
            y = f(x + (acc * 1e-20).astype(x.dtype), *rest)
            return jnp.sum(y, dtype=jnp.float32) * 1e-12, None
        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=REPEAT)
        return acc
    return run


def make_scan_vjp(f, n_rest):
    """Jitted scan-repeat of value+grad wrt ALL args of sum(f(...))."""
    @jax.jit
    def run(x, *rest):
        def body(acc, _):
            def lf(x, *rest):
                return jnp.sum(f(x, *rest), dtype=jnp.float32) * 1e-12
            val, grads = jax.value_and_grad(lf, argnums=tuple(range(1 + n_rest)))(
                x + (acc * 1e-20).astype(x.dtype), *rest)
            gsum = sum(jnp.sum(g, dtype=jnp.float32) for g in grads)
            return val + gsum * 1e-12, None
        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=REPEAT)
        return acc
    return run


def conv_block(x, w, gamma, beta):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((w.shape[0] // 2,) * 2, (w.shape[0] // 2,) * 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    mean = jnp.mean(y, axis=(0, 1, 2))
    var = jnp.var(y, axis=(0, 1, 2))
    y = (y - mean) * jax.lax.rsqrt(var + 1e-5) * gamma + beta
    return jnp.where(y >= 0, y, 0.1 * y).astype(x.dtype)


def conv_only(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((w.shape[0] // 2,) * 2, (w.shape[0] // 2,) * 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def pool_rw(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def pool_reshape(x):
    b, h, w, c = x.shape
    return x.reshape(b, h // 2, 2, w // 2, 2, c).max(axis=(2, 4))


# Darknet-19 conv shapes (size, in, out, k) at 416 input and pools (size, ch)
CONVS = [
    (416, 3, 32, 3), (208, 32, 64, 3), (104, 64, 128, 3), (104, 128, 64, 1),
    (104, 64, 128, 3), (52, 128, 256, 3), (52, 256, 128, 1), (52, 128, 256, 3),
    (26, 256, 512, 3), (26, 512, 256, 1), (26, 256, 512, 3), (26, 512, 256, 1),
    (26, 256, 512, 3), (13, 512, 1024, 3), (13, 1024, 512, 1),
    (13, 512, 1024, 3), (13, 1024, 512, 1), (13, 512, 1024, 3),
    (13, 1024, 1024, 3), (13, 1024, 1024, 3), (26, 512, 64, 1),
    (13, 1280, 1024, 3), (13, 1024, 125, 1),
]
POOLS = [(416, 32), (208, 64), (104, 128), (52, 256), (26, 512)]


BLOCK_SUBSET = {(416, 3, 32, 3), (104, 64, 128, 3), (26, 256, 512, 3),
                (13, 512, 1024, 3), (13, 1024, 1024, 3), (13, 1024, 512, 1)}


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--pools", action="store_true",
                    help="also sweep pool formulations (first run recorded "
                    "rw bwd 12.49/6.25 ms at 416²x32 / 208²x64)")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    if args.pools:
        fwd_rw, vjp_rw = make_scan_fwd(pool_rw, 0), make_scan_vjp(pool_rw, 0)
        fwd_rs, vjp_rs = make_scan_fwd(pool_reshape, 0), make_scan_vjp(pool_reshape, 0)
        print(f"== pools (B={B}, bf16): reduce_window vs reshape-max ==", flush=True)
        for size, ch in POOLS:
            x = jax.device_put(rng.uniform(-1, 1, (B, size, size, ch)).astype(np.float32)).astype(dt)
            f_rw = time_fn(fwd_rw, x)
            v_rw = time_fn(vjp_rw, x)
            f_rs = time_fn(fwd_rs, x)
            v_rs = time_fn(vjp_rs, x)
            print(f"pool {size:4d}²×{ch:4d}: rw fwd {f_rw:6.2f} bwd {v_rw - f_rw:6.2f} | "
                  f"reshape fwd {f_rs:6.2f} bwd {v_rs - f_rs:6.2f} ms", flush=True)

    fwd_blk, vjp_blk = make_scan_fwd(conv_block, 3), make_scan_vjp(conv_block, 3)
    fwd_c, vjp_c = make_scan_fwd(conv_only, 1), make_scan_vjp(conv_only, 1)

    print(f"\n== convs (B={B}, bf16; block = +BN+leaky, subset only) ==", flush=True)
    tot_cf = tot_cb = 0.0
    for size, cin, cout, k in CONVS:
        x = jax.device_put(rng.uniform(-1, 1, (B, size, size, cin)).astype(np.float32)).astype(dt)
        w = jax.device_put((rng.normal(0, 0.05, (k, k, cin, cout))).astype(np.float32)).astype(dt)
        cf = time_fn(fwd_c, x, w)
        cv = time_fn(vjp_c, x, w)
        tot_cf += cf; tot_cb += cv - cf
        extra = ""
        if (size, cin, cout, k) in BLOCK_SUBSET:
            gamma = jnp.ones((cout,), jnp.float32)
            beta = jnp.zeros((cout,), jnp.float32)
            f = time_fn(fwd_blk, x, w, gamma, beta)
            v = time_fn(vjp_blk, x, w, gamma, beta)
            extra = f" | block fwd {f:6.2f} bwd {v - f:6.2f}"
        print(f"{size:4d}²×{cin:4d}→{cout:4d} k{k}: conv fwd {cf:6.2f} "
              f"bwd {cv - cf:6.2f}{extra} ms", flush=True)
    print(f"TOTAL conv-only: fwd {tot_cf:.2f} bwd {tot_cb:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
