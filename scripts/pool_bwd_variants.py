#!/usr/bin/env python
"""Max-pool backward formulations, isolated (B=128 bf16, round-3 train work).

SelectAndScatter (XLA's reduce_window grad) runs pool1-bwd at 12.5 ms vs a
~4 ms traffic bound; the quadrant-slice custom VJP regressed the full step
(strided slicing + interleave relayouts).  This sweeps candidate
formulations per pool shape to find one worth shipping:

  v0 SaS        reduce_window autodiff baseline
  v1 quadrant   stride-2 slices + priority masks + stack/reshape interleave
  v2 view6d     reshape (b,h2,2,w2,2,c) view, masks in 6-d, no explicit
                slices; priority via cross-axis selects
  v3 allties    repeat-upsample y,g; dx = (x==up_y) * up_g  (NOT SaS-parity:
                ties get the full cotangent each — floor measurement for the
                data-movement pattern)

    setsid nohup python -u scripts/pool_bwd_variants.py > /tmp/poolvar.log &
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
POOLS = [(416, 32), (208, 64), (104, 128), (52, 256), (26, 512)]


def time_fn(fn, *args, iters=6):
    out = fn(*args)
    float(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    float(outs[-1])
    return (time.perf_counter() - t0) / iters / REPEAT * 1e3


def pool_fwd(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def bwd_quadrant(x, y, g):
    # the shipped tie-semantics oracle — import, don't re-implement, so the
    # sweep always measures exactly what models/blocks.py would route
    from yolojax.models.blocks import _max_pool2x2_bwd

    (dx,) = _max_pool2x2_bwd((x, y), g)
    return dx


def bwd_view6d(x, y, g):
    b, h, w, c = x.shape
    xr = x.reshape(b, h // 2, 2, w // 2, 2, c)
    yb = y[:, :, None, :, None, :]
    gb = g[:, :, None, :, None, :]
    eq = xr == yb
    # priority: first max in row-major (i,j) window order.  prev[i,j] = any
    # eq at an earlier position; computed with cumulative ORs along the two
    # tiny axes (no explicit slicing).
    cum_j = jnp.cumsum(eq.astype(jnp.int32), axis=4)        # inclusive along j
    cum_ij = jnp.cumsum(cum_j[:, :, :, :, -1:, :], axis=2)  # rows complete
    prev_rows = jnp.concatenate(
        [jnp.zeros_like(cum_ij[:, :, :1]), cum_ij[:, :, :-1]], axis=2)
    prev = prev_rows + (cum_j - eq.astype(jnp.int32))
    first = eq & (prev == 0)
    dx = jnp.where(first, gb, jnp.zeros((), g.dtype))
    return dx.reshape(b, h, w, c)


def bwd_allties(x, y, g):
    b, h, w, c = x.shape
    up = lambda t: jnp.repeat(jnp.repeat(t, 2, axis=1), 2, axis=2)
    return jnp.where(x == up(y), up(g), jnp.zeros((), g.dtype))


def main():
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    variants = {"quadrant": bwd_quadrant, "view6d": bwd_view6d,
                "allties": bwd_allties}

    @jax.jit
    def sas(x, g):
        def body(acc, _):
            _, vjp = jax.vjp(pool_fwd, x + (acc * 1e-20).astype(x.dtype))
            (dx,) = vjp(g)
            return jnp.sum(dx, dtype=jnp.float32) * 1e-12, None
        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=REPEAT)
        return acc

    jitted = {}
    for name, fn in variants.items():
        @jax.jit
        def run(x, y, g, fn=fn):
            def body(acc, _):
                dx = fn(x + (acc * 1e-20).astype(x.dtype), y, g)
                return jnp.sum(dx, dtype=jnp.float32) * 1e-12, None
            acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=REPEAT)
            return acc
        jitted[name] = run

    for size, ch in POOLS:
        x = jax.device_put(rng.uniform(-1, 1, (B, size, size, ch))
                           .astype(np.float32)).astype(dt)
        y = pool_fwd(x)
        g = jax.device_put(rng.uniform(-1, 1, (B, size // 2, size // 2, ch))
                           .astype(np.float32)).astype(dt)
        line = [f"pool {size:4d}²×{ch:4d}:"]
        line.append(f"SaS {time_fn(sas, x, g):6.2f}")
        for name, run in jitted.items():
            line.append(f"{name} {time_fn(run, x, y, g):6.2f}")
        print("  ".join(line) + " ms", flush=True)

    # correctness cross-check on a small tie-heavy case (f32, host)
    xs = jnp.asarray(np.round(rng.normal(0, 1, (2, 8, 8, 3)) * 2) / 2, jnp.float32)
    gs = jnp.asarray(rng.normal(0, 1, (2, 4, 4, 3)), jnp.float32)
    ys = pool_fwd(xs)
    _, vjp = jax.vjp(pool_fwd, xs)
    (ref,) = vjp(gs)
    for name in ("quadrant", "view6d"):
        got = variants[name](xs, ys, gs)
        ok = bool(jnp.array_equal(got, ref))
        print(f"parity {name}: {'OK' if ok else 'MISMATCH'}", flush=True)


if __name__ == "__main__":
    main()
