#!/usr/bin/env python
"""In-graph check of per-shape split-pool routing on the fused detect path
(VERDICT r2 #5 follow-up to scripts/pool_split_sweep.py).

The isolated sweep says the two-pass 1-D reduce_window beats the 2-D form
at the 104² and 26² forwards only (~0.75 ms combined upper bound).  This
measures the real fused detect (fold → forward → fusedpost) with the stock
pool vs split routed at {104², 26²} and at {104²} alone, same process,
fresh jit per variant.

    setsid nohup python -u scripts/pool_route_bench.py > /tmp/poolroute.log &
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import yolojax.models.engine as engine
from yolojax.models import blocks

B = 128
REPEAT = 4
ITERS = 20


def make_routed(sizes):
    def routed_max_pool(x, size: int = 2, stride: int | None = None):
        st = size if stride is None else stride
        if size == 2 and st == 2 and x.shape[1] in sizes:
            y = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                      (1, 2, 1, 1), (1, 2, 1, 1), "VALID")
            return jax.lax.reduce_window(y, -jnp.inf, jax.lax.max,
                                         (1, 1, 2, 1), (1, 1, 2, 1), "VALID")
        return blocks.max_pool(x, size, stride)
    return routed_max_pool


def build_detect():
    from __graft_entry__ import _flagship
    from yolojax.kernels.nms import postprocess_fused_pallas
    from yolojax.models.inference import Inference

    model = _flagship()
    params, state = model.init(jax.random.PRNGKey(0))
    b = np.array(params["out"]["b"])
    b.reshape(-1, 5 + model.num_classes)[:, 4] = -6.0  # trained density (bench.py)
    params["out"]["b"] = jnp.asarray(b)
    inference = Inference(model)
    folded = inference.fold(params, state)
    anchors_np = np.asarray(model.anchors)

    @jax.jit
    def run(folded, images):
        def body(acc, _):
            raw = model.apply_folded(folded, images + (acc * 1e-20).astype(images.dtype))
            out = postprocess_fused_pallas(raw, anchors_np, threshold=0.005,
                                           overlap=0.45, topk=100)
            return out.conf.sum(dtype=np.float32), None

        acc, _ = jax.lax.scan(body, np.float32(0), None, length=REPEAT)
        return acc

    return run, folded


def time_variant(tag, images):
    run, folded = build_detect()
    float(run(folded, images))
    float(run(folded, images))
    t0 = time.perf_counter()
    outs = [run(folded, images) for _ in range(ITERS)]
    ref = float(outs[-1])
    dt = time.perf_counter() - t0
    rate = B * ITERS * REPEAT / dt
    print(f"{tag:24s}: {dt / ITERS / REPEAT * 1e3:6.2f} ms/batch  {rate:7.0f} img/s"
          f"  (conf-sum {ref:.4f})", flush=True)
    return rate


def main():
    rng = np.random.default_rng(0)
    images = jax.device_put(rng.uniform(0, 1, (B, 416, 416, 3)).astype(np.float32))
    stock = engine.max_pool
    time_variant("stock 2d pools", images)
    engine.max_pool = make_routed({104, 26})
    time_variant("split @ {104, 26}", images)
    engine.max_pool = make_routed({104})
    time_variant("split @ {104}", images)
    engine.max_pool = stock
    time_variant("stock again (drift chk)", images)


if __name__ == "__main__":
    main()
