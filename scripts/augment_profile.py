#!/usr/bin/env python
"""In-graph decomposition of the fused train augment (scan-repeat method,
DEVNOTES "round 2: measurement artifact" — per-dispatch tunnel gaps make
eager stage timing lie; repeat inside one program instead).

Stages, cumulative, B=128 canvas 672 → 416:
  r   resize (scale_and_translate) only
  rf  + flip
  rfh + HSV jitter            (= production augment)
Variants: antialias on/off (darknet's own resize is plain bilinear — no
antialias — so `off` is the reference-faithful semantics), bf16 vs f32.

Also times device_put of one uint8 host batch (the axon tunnel transfer that
bounds BENCH_MODE=e2e on this sandbox).

    setsid nohup python -u scripts/augment_profile.py > /tmp/augprof.log &
"""

from __future__ import annotations

import os
import sys
import time
from dataclasses import replace

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from yolojax.data.transform import TrainAugment

B, C, S = 128, 672, 416
REPEAT = 4


def make_batch(rng):
    canvas = rng.integers(0, 256, (B, C, C, 3), np.uint8)
    hw = rng.uniform(300, 660, (B, 2)).astype(np.float32)
    g = 30
    center = rng.uniform(0.2, 0.8, (B, g, 2)).astype(np.float32)
    half = rng.uniform(0.02, 0.3, (B, g, 2)).astype(np.float32)
    return (canvas, hw, np.clip(center - half, 0, 1),
            np.clip(center + half, 0, 1), np.ones((B, g), bool))


def time_aug(aug: TrainAugment, batch, iters=8):
    # device_put ONCE: passing host numpy re-transfers the 173 MB canvas
    # through the 0.03 GB/s tunnel on every dispatch and the "augment"
    # timing becomes a transfer benchmark (first run of this script did
    # exactly that — every row ≈ 1.3 s/batch ≈ the 5 s transfer / REPEAT)
    canvas, hw, ymin, ymax, valid = (jax.device_put(a) for a in batch)

    @jax.jit
    def run(key, canvas, hw, ymin, ymax, valid):
        def body(key, _):
            key, sub = jax.random.split(key)
            img, mn, mx, v = aug(sub, canvas, hw, ymin, ymax, valid, S)
            return key, img.astype(jnp.float32).mean()
        _, outs = jax.lax.scan(body, key, None, length=REPEAT)
        return outs.sum()

    key = jax.random.PRNGKey(0)
    out = run(key, canvas, hw, ymin, ymax, valid)
    float(out)
    t0 = time.perf_counter()
    outs = [run(jax.random.PRNGKey(i), canvas, hw, ymin, ymax, valid)
            for i in range(1, iters + 1)]
    float(outs[-1])
    return (time.perf_counter() - t0) / iters / REPEAT * 1e3


def main():
    rng = np.random.default_rng(0)
    batch = make_batch(rng)

    # tunnel transfer: one uint8 host batch, host->device
    mb = batch[0].nbytes / 1e6
    dev = jax.device_put(batch[0])
    float(jnp.float32(dev.sum()))  # force
    t0 = time.perf_counter()
    for _ in range(4):
        dev = jax.device_put(batch[0])
        float(jnp.float32(dev[0, 0, 0, 0]))
    dt = (time.perf_counter() - t0) / 4
    print(f"device_put (B,672,672,3) u8: {mb:.0f} MB in {dt*1e3:.0f} ms "
          f"= {mb/dt/1e3:.2f} GB/s tunnel bandwidth", flush=True)

    base = TrainAugment()
    rows = [
        ("resize only            bf16 aa=1", replace(base, flip=False, hsv=False)),
        ("resize+flip            bf16 aa=1", replace(base, hsv=False)),
        ("production (r+f+hsv)   bf16 aa=1", base),
    ]
    if hasattr(base, "antialias"):
        rows += [
            ("resize only            bf16 aa=0", replace(base, flip=False, hsv=False, antialias=False)),
            ("production             bf16 aa=0", replace(base, antialias=False)),
            ("production             f32  aa=0", replace(base, antialias=False, dtype=jnp.float32)),
        ]
    rows += [("production             f32  aa=1", replace(base, dtype=jnp.float32))]

    for name, aug in rows:
        ms = time_aug(aug, batch)
        print(f"{name}: {ms:7.2f} ms/batch  ({B/ms*1e3:6.0f} img/s)", flush=True)


if __name__ == "__main__":
    main()
