#!/usr/bin/env python
"""Per-layer conv microbenchmark vs each layer's own roofline (v5e).

Times every Darknet-19 conv (fused conv+bias+leaky, folded-inference form,
bf16 in / bf16 out) in isolation at a given batch, plus the maxpools, and
compares against the layer's compute/memory roofline. This locates where the
whole-model gap to roofline (DEVNOTES.md "XLA lessons") actually lives.

Usage: python scripts/conv_profile.py [batch] [size]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

PEAK_TF = 197e12   # v5e bf16 MXU
PEAK_BW = 819e9    # v5e HBM bytes/s


def time_fn(fn, *args, iters=20):
    out = fn(*args)
    float(out.sum() if hasattr(out, "sum") else out)  # compile + force (tunnel)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    float(outs[-1].sum() if hasattr(outs[-1], "sum") else outs[-1])
    return (time.perf_counter() - t0) / iters


REPEAT = 10  # in-program repetitions to amortize per-dispatch tunnel overhead


def conv_layer(cin, cout, k, stride=1):
    pad = k // 2

    @jax.jit
    def f(x, w, b):
        # serial scalar carry: fed back into the conv input (fused, ~free)
        # so XLA cannot CSE the repeated convs or run them as one
        def body(acc, _):
            y = jax.lax.conv_general_dilated(
                x + (acc * 1e-20).astype(x.dtype), w,
                window_strides=(stride, stride), padding=((pad, pad), (pad, pad)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = jnp.where(y >= 0, y + b, 0.1 * (y + b)).astype(jnp.bfloat16)
            return y.sum(dtype=jnp.float32), None

        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=REPEAT)
        return acc

    return f


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 416
    # (name, spatial_in, cin, cout, k, stride)
    s = size
    layers = []
    def c(name, cin, cout, k):
        layers.append((name, s, cin, cout, k))
    c("c1", 3, 32, 3); s //= 2
    c("c2", 32, 64, 3); s //= 2
    c("c3", 64, 128, 3); c("c4", 128, 64, 1); c("c5", 64, 128, 3); s //= 2
    c("c6", 128, 256, 3); c("c7", 256, 128, 1); c("c8", 128, 256, 3); s //= 2
    c("c9", 256, 512, 3); c("c10", 512, 256, 1); c("c11", 256, 512, 3)
    c("c12", 512, 256, 1); c("c13", 256, 512, 3); s //= 2
    c("c14", 512, 1024, 3); c("c15", 1024, 512, 1); c("c16", 512, 1024, 3)
    c("c17", 1024, 512, 1); c("c18", 512, 1024, 3)
    c("c19", 1024, 1024, 3); c("c20", 1024, 1024, 3)
    layers.append(("c21", s * 2, 512, 64, 1))
    c("c22", 1280, 1024, 3)
    c("out", 1024, 125, 1)

    rng = np.random.default_rng(0)
    total_meas = total_roof = 0.0
    print(f"{'layer':>5} {'HxW':>7} {'cin':>5} {'cout':>5} k {'ms':>8} {'roof':>7} "
          f"{'eff%':>5} {'TF/s':>6}")
    for name, sp, cin, cout, k in layers:
        x = jax.device_put(rng.standard_normal((batch, sp, sp, cin), np.float32)
                           .astype(jnp.bfloat16))
        w = jax.device_put((rng.standard_normal((k, k, cin, cout), np.float32) * 0.05)
                           .astype(jnp.bfloat16))
        b = jax.device_put(np.zeros((cout,), np.float32))
        f = conv_layer(cin, cout, k)
        ms = time_fn(f, x, w, b) * 1e3 / REPEAT
        flops = 2 * batch * sp * sp * cout * cin * k * k
        bytes_ = 2 * batch * sp * sp * (cin + cout) + 2 * k * k * cin * cout
        roof = max(flops / PEAK_TF, bytes_ / PEAK_BW) * 1e3
        eff = roof / ms * 100
        total_meas += ms; total_roof += roof
        print(f"{name:>5} {sp:>4}x{sp:<3} {cin:>5} {cout:>5} {k} {ms:8.2f} {roof:7.2f} "
              f"{eff:5.0f} {flops/ms/1e9:6.1f}")
    print(f"{'TOTAL':>5} {'':>23} {total_meas:8.2f} {total_roof:7.2f} "
          f"{total_roof/total_meas*100:5.0f}")


if __name__ == "__main__":
    main()
