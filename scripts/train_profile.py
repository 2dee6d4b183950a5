#!/usr/bin/env python
"""Train-step decomposition on the real TPU (VERDICT r2 "next round" #1).

Applies the round-2 scan-repeat methodology (in-graph ``lax.scan`` with a
scalar carry perturbing the input so XLA cannot CSE iterations — the method
that exposed the phantom "conv roofline gap") to the TRAIN path:

    stage 1  fused augment        (672² u8 canvas → 416² f32 + boxes)
    stage 2  forward (train=True) (bf16 convs, batch-stat BN)
    stage 3  forward + region loss
    stage 4  + grads (value_and_grad)
    stage 5  + clip + SGD-momentum update
    stage 6  the production fused step (augment + fwd + loss + grad + update)

Prints per-stage ms/batch and the implied img/s, plus stage deltas
(loss = s3-s2, backward = s4-s3, update = s5-s4, augment = s6-s5 check).

Usage (serialize with all other TPU work — the chip is exclusive):
    setsid nohup python -u scripts/train_profile.py [BATCH] > /tmp/tp.log &
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax

REPEAT = 4


def time_fn(fn, *args, iters=8):
    out = fn(*args)
    float(out)  # force completion through the tunnel (DEVNOTES)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    float(outs[-1])
    return (time.perf_counter() - t0) / iters / REPEAT


def main():
    # usage: train_profile.py [BATCH] [darknet|tiny|mobilenet]
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    which = sys.argv[2] if len(sys.argv) > 2 else "darknet"
    size, canvas, g = 416, 672, 30

    from __graft_entry__ import _flagship
    from yolojax.data.transform import TrainAugment
    from yolojax.ops.loss import LossConfig, region_loss
    from yolojax.parallel.mesh import loss_weights_from_config

    model = _flagship(backbone=which)
    params, state = model.init(jax.random.PRNGKey(0))
    anchors = jnp.asarray(model.anchors)
    aug = TrainAugment()
    loss_cfg = LossConfig()
    weights = {"coord": 1.0, "object": 5.0, "noobject": 1.0, "cls": 1.0,
               "prior": 0.01}
    opt = optax.chain(optax.clip_by_global_norm(5.0),
                      optax.sgd(1e-3, momentum=0.9))
    opt_state = opt.init(params)

    rng = np.random.default_rng(0)
    center = rng.uniform(0.3, 0.7, (batch, g, 2)).astype(np.float32)
    half = rng.uniform(0.05, 0.2, (batch, g, 2)).astype(np.float32)
    host = {
        "canvas": rng.integers(0, 255, (batch, canvas, canvas, 3), dtype=np.uint8),
        "hw": np.full((batch, 2), 600, np.float32),
        "yx_min": np.clip(center - half, 0, 1),
        "yx_max": np.clip(center + half, 0, 1),
        "cls": rng.integers(0, 20, (batch, g)).astype(np.int32),
        "valid": rng.uniform(size=(batch, g)) < 0.3,
    }
    b = jax.device_put(host)
    images_f32 = jax.device_put(
        rng.uniform(0, 1, (batch, size, size, 3)).astype(np.float32))
    key = jax.random.PRNGKey(7)
    seen = jnp.int32(1 << 20)

    def scan(body):
        def run(*args):
            acc, _ = jax.lax.scan(lambda a, _: (body(a, *args), None),
                                  jnp.float32(0), None, length=REPEAT)
            return acc
        return jax.jit(run)

    # ---- stage 1: augment alone
    def s1(acc, b, key):
        # fold the DATA-DEPENDENT carry into the key: `acc & 0` is folded to
        # a constant by XLA's simplifier, making the augment loop-invariant
        # and hoistable out of the scan (it then runs once, not REPEAT times,
        # and the printed "standalone" figure reads up to REPEAT× too fast —
        # exactly the round-1 "6 ms" artifact this script exists to avoid)
        k = jax.random.fold_in(key, acc.astype(jnp.int32) & 1)
        img, ymin, ymax, valid = aug(k, b["canvas"], b["hw"], b["yx_min"],
                                     b["yx_max"], b["valid"], size)
        return acc + img.sum(dtype=jnp.float32) * 1e-12

    # ---- stage 2: forward train=True
    def s2(acc, params, state, images):
        raw, _ = model.apply(params, state,
                             images + (acc * 1e-20).astype(images.dtype),
                             train=True)
        return acc + raw.sum(dtype=jnp.float32) * 1e-12

    # ---- stage 3: + loss
    def loss_of(params, state, images, b, seen):
        raw, new_state = model.apply(params, state, images, train=True)
        comps = region_loss(raw, anchors, b["yx_min"], b["yx_max"], b["cls"],
                            b["valid"], seen, loss_cfg)
        return sum(weights[k] * comps[k] for k in comps), new_state

    def s3(acc, params, state, images, b, seen):
        total, _ = loss_of(params, state,
                           images + (acc * 1e-20).astype(images.dtype), b, seen)
        return acc + total * 1e-6

    # ---- stage 4: + grads
    def s4(acc, params, state, images, b, seen):
        (total, _), grads = jax.value_and_grad(loss_of, has_aux=True)(
            params, state, images + (acc * 1e-20).astype(images.dtype), b, seen)
        gsum = sum(jnp.sum(x, dtype=jnp.float32)
                   for leaf in jax.tree_util.tree_leaves(grads) for x in [leaf])
        return acc + total * 1e-6 + gsum * 1e-12

    # ---- stage 5: + update (no augment)
    def s5_run(params, state, opt_state, images, b, seen):
        def body(carry, _):
            params, opt_state, acc = carry
            (total, _), grads = jax.value_and_grad(loss_of, has_aux=True)(
                params, state, images + (acc * 1e-20).astype(images.dtype),
                b, seen)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, acc + total * 1e-6), None
        (params, opt_state, acc), _ = jax.lax.scan(
            body, (params, opt_state, jnp.float32(0)), None, length=REPEAT)
        return acc

    # ---- stage 6: full production fused step
    def make_s6(barrier: bool):
        def s6_run(params, state, opt_state, b, seen, key):
            def body(carry, i):
                params, opt_state, acc = carry
                k = jax.random.fold_in(key, i + (acc.astype(jnp.int32) & 0))
                img, ymin, ymax, valid = aug(k, b["canvas"], b["hw"], b["yx_min"],
                                             b["yx_max"], b["valid"], size)
                if barrier:
                    # force the augment output to materialize before the
                    # fwd/bwd so XLA cannot interleave/remat it into the
                    # backward (suspect for the 17 ms in-step augment cost
                    # vs 6 ms standalone)
                    img, ymin, ymax, valid = jax.lax.optimization_barrier(
                        (img, ymin, ymax, valid))
                bb = {"yx_min": ymin, "yx_max": ymax, "cls": b["cls"],
                      "valid": valid}
                (total, _), grads = jax.value_and_grad(loss_of, has_aux=True)(
                    params, state, img, bb, seen)
                updates, opt_state = opt.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state, acc + total * 1e-6), None
            (params, opt_state, acc), _ = jax.lax.scan(
                body, (params, opt_state, jnp.float32(0)),
                jnp.arange(REPEAT), length=REPEAT)
            return acc
        return s6_run

    results = {}
    t = time_fn(scan(s1), b, key) * 1e3
    results["augment"] = t
    print(f"s1 augment          {t:7.2f} ms  {batch/t*1e3:7.0f} img/s", flush=True)
    t = time_fn(scan(s2), params, state, images_f32) * 1e3
    results["fwd"] = t
    print(f"s2 fwd(train)       {t:7.2f} ms  {batch/t*1e3:7.0f} img/s", flush=True)
    t = time_fn(scan(s3), params, state, images_f32, b, seen) * 1e3
    results["fwd_loss"] = t
    print(f"s3 fwd+loss         {t:7.2f} ms  {batch/t*1e3:7.0f} img/s", flush=True)
    t = time_fn(scan(s4), params, state, images_f32, b, seen) * 1e3
    results["fwd_loss_grad"] = t
    print(f"s4 +grad            {t:7.2f} ms  {batch/t*1e3:7.0f} img/s", flush=True)
    t = time_fn(jax.jit(s5_run), params, state, opt_state, images_f32, b, seen) * 1e3
    results["step_noaug"] = t
    print(f"s5 +update          {t:7.2f} ms  {batch/t*1e3:7.0f} img/s", flush=True)
    t = time_fn(jax.jit(make_s6(False)), params, state, opt_state, b, seen, key) * 1e3
    results["step_full"] = t
    print(f"s6 full fused step  {t:7.2f} ms  {batch/t*1e3:7.0f} img/s", flush=True)
    t = time_fn(jax.jit(make_s6(True)), params, state, opt_state, b, seen, key) * 1e3
    results["step_barrier"] = t
    print(f"s6b step w/barrier  {t:7.2f} ms  {batch/t*1e3:7.0f} img/s", flush=True)

    print(f"\ndeltas: loss {results['fwd_loss']-results['fwd']:.2f}  "
          f"backward {results['fwd_loss_grad']-results['fwd_loss']:.2f}  "
          f"update {results['step_noaug']-results['fwd_loss_grad']:.2f}  "
          f"augment-in-step {results['step_full']-results['step_noaug']:.2f}  "
          f"(standalone augment {results['augment']:.2f})", flush=True)
    print(f"bwd/fwd ratio: "
          f"{(results['fwd_loss_grad']-results['fwd_loss'])/results['fwd']:.2f}",
          flush=True)


if __name__ == "__main__":
    main()
