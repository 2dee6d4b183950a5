#!/usr/bin/env python
"""In-model ablation of the train fwd+bwd (round-3 roofline accounting).

Times jax.value_and_grad of the full Darknet-19 loss at B=128 @416 under:
  A  production        (batch-stat BN, reduce_window pools)
  B  BN disabled       (Δ = in-model BN fwd+bwd cost)
  C  pools → stride-2 subsample (wrong semantics, cheap grad: Δ ≈ in-model
     pool fwd+bwd cost — slice bwd is a dilated pad, ~traffic-bound)

    setsid nohup python -u scripts/train_ablate.py > /tmp/ablate.log &
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


def time_fn(fn, *args, iters=8):
    out = fn(*args)
    float(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    float(outs[-1])
    return (time.perf_counter() - t0) / iters / REPEAT * 1e3


def main():
    from __graft_entry__ import _flagship
    from yolojax.models.blocks import BNConfig
    from yolojax.ops.loss import LossConfig, region_loss

    batch, size, g = 128, 416, 30
    loss_cfg = LossConfig()
    weights = {"coord": 1.0, "object": 5.0, "noobject": 1.0, "cls": 1.0,
               "prior": 0.01}

    rng = np.random.default_rng(0)
    center = rng.uniform(0.3, 0.7, (batch, g, 2)).astype(np.float32)
    half = rng.uniform(0.05, 0.2, (batch, g, 2)).astype(np.float32)
    images = jax.device_put(rng.uniform(0, 1, (batch, size, size, 3)).astype(np.float32))
    b = {
        "yx_min": jax.device_put(np.clip(center - half, 0, 1)),
        "yx_max": jax.device_put(np.clip(center + half, 0, 1)),
        "cls": jax.device_put(rng.integers(0, 20, (batch, g)).astype(np.int32)),
        "valid": jax.device_put(np.ones((batch, g), bool)),
    }
    seen = jnp.int32(1 << 20)

    def run_variant(name, model):
        params, state = model.init(jax.random.PRNGKey(0))
        anchors = jnp.asarray(model.anchors)

        def loss_of(params, images):
            raw, _ = model.apply(params, state, images, train=True)
            comps = region_loss(raw, anchors, b["yx_min"], b["yx_max"],
                                b["cls"], b["valid"], seen, loss_cfg)
            return sum(weights[k] * comps[k] for k in comps)

        @jax.jit
        def vg(params, images):
            def body(acc, _):
                total, grads = jax.value_and_grad(loss_of)(
                    params, images + (acc * 1e-20).astype(images.dtype))
                gsum = sum(jnp.sum(x, dtype=jnp.float32)
                           for x in jax.tree_util.tree_leaves(grads))
                return acc + total * 1e-6 + gsum * 1e-12, None
            acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=REPEAT)
            return acc

        t = time_fn(vg, params, images)
        print(f"{name:28s} {t:7.2f} ms  {batch/t*1e3:7.0f} img/s", flush=True)
        return t

    a = run_variant("A production", _flagship())

    bn_off = _flagship()
    bn_off.bn = BNConfig(enable=False)
    bb = run_variant("B bn-disabled", bn_off)

    import yolojax.models.blocks as blocks

    orig = blocks.max_pool

    def subsample_pool(x, size_=2, stride=None):
        stride = size_ if stride is None else stride
        if stride == 1:
            return orig(x, size_, stride)
        return x[:, ::2, ::2, :]

    # engine.py binds max_pool at import; patch both
    import yolojax.models.engine as engine

    blocks.max_pool = engine.max_pool = subsample_pool
    try:
        cc = run_variant("C pools->subsample", _flagship())
    finally:
        blocks.max_pool = engine.max_pool = orig

    print(f"\nin-model deltas: BN fwd+bwd {a - bb:.2f} ms, "
          f"pools fwd+bwd ≈ {a - cc:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
