#!/usr/bin/env python
"""Clean scan-repeat timing of the full folded forward / fused detect.

Separates real model time from per-dispatch tunnel overhead (which the
plain dispatch-pipeline timing in bench.py partially amortizes but the
per-layer microbenchmarks showed is ~1.5 ms/call).
"""

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


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    from __graft_entry__ import _flagship
    from yolojax.models.inference import Inference
    from yolojax.kernels.nms import postprocess_pallas

    model = _flagship()
    params, state = model.init(jax.random.PRNGKey(0))
    inference = Inference(model)
    folded = inference.fold(params, state)

    rng = np.random.default_rng(0)
    images = jax.device_put(
        rng.uniform(0, 1, (batch, 416, 416, 3)).astype(np.float32))

    @jax.jit
    def fwd(folded, images):
        def body(acc, _):
            raw = model.apply_folded(folded, images + (acc * 1e-20).astype(images.dtype))
            return raw.sum(dtype=jnp.float32), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=REPEAT)
        return acc

    @jax.jit
    def detect(folded, images):
        def body(acc, _):
            det = inference(folded, images + (acc * 1e-20).astype(images.dtype))
            out = postprocess_pallas(det, threshold=0.005, overlap=0.45, topk=100)
            return out.conf.sum(dtype=jnp.float32), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=REPEAT)
        return acc

    ms = time_fn(fwd, folded, images) * 1e3
    print(f"forward  B={batch}: {ms:7.2f} ms  {batch/ms*1e3:7.1f} img/s")
    ms = time_fn(detect, folded, images) * 1e3
    print(f"detect   B={batch}: {ms:7.2f} ms  {batch/ms*1e3:7.1f} img/s")


if __name__ == "__main__":
    main()
