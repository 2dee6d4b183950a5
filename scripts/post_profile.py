#!/usr/bin/env python
"""Break down fused-detect postprocess cost: decode vs Pallas NMS vs gather."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

REPEAT = 8


def time_fn(fn, *args, iters=12):
    out = fn(*args)
    float(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    float(outs[-1])
    return (time.perf_counter() - t0) / iters / REPEAT


def rep(make_body):
    @jax.jit
    def f(*args):
        def body(acc, _):
            y = make_body(acc, *args)
            return y, None
        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=REPEAT)
        return acc
    return f


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    from yolojax.ops.decode import decode, Detections
    from yolojax.kernels.nms import postprocess_pallas, nms_select_pallas

    rng = np.random.default_rng(0)
    a, c, g = 5, 20, 13
    n = a * g * g
    raw = jax.device_put(rng.standard_normal(
        (batch, g, g, a * (5 + c)), np.float32).astype(jnp.bfloat16))
    anchors = jax.device_put(np.abs(rng.standard_normal((a, 2), np.float32)) * 3)

    f_decode = rep(lambda acc, raw, anchors: sum(
        x.sum(dtype=jnp.float32) for x in decode(
            raw + (acc * 1e-20).astype(raw.dtype), anchors)))
    ms = time_fn(f_decode, raw, anchors) * 1e3
    print(f"decode          B={batch}: {ms:7.2f} ms")

    det = decode(raw, anchors)
    det = jax.tree.map(lambda x: jax.device_put(np.asarray(x)), det)

    f_post = rep(lambda acc, ymin, ymax, conf: postprocess_pallas(
        Detections(ymin + (acc * 1e-20).astype(ymin.dtype), ymax, conf[..., 0], jnp.ones_like(conf), conf),
        threshold=0.005, overlap=0.45, topk=100).conf.sum(dtype=jnp.float32))
    ms = time_fn(f_post, det.yx_min, det.yx_max, det.conf) * 1e3
    print(f"postproc pallas B={batch}: {ms:7.2f} ms")

    # trained-model-like sparsity: most confs below threshold
    conf_sparse = np.asarray(det.conf)
    mask = rng.uniform(size=conf_sparse.shape) < 0.98
    conf_sparse = np.where(mask, 0.0001, np.abs(conf_sparse))
    conf_sparse = jax.device_put(conf_sparse.astype(np.float32))
    ms = time_fn(f_post, det.yx_min, det.yx_max, conf_sparse) * 1e3
    print(f"postproc sparse B={batch}: {ms:7.2f} ms")


if __name__ == "__main__":
    main()
