"""Data-parallel mesh + fully-fused sharded train step (SURVEY.md §2.17, §5).

Replaces the reference's ``nn.DataParallel(dnn)`` + Python optimizer loop
(reference ``train.py`` (recon)) with one jitted SPMD program per input size:

    forward (bf16 convs) → region loss → grads → optax update

* mesh: 1-D ``('data',)`` over all local devices (multi-host: over the whole
  pod — each process feeds its local shard, as in standard JAX multi-host);
* batch tensors sharded on axis 0, params/opt state replicated; XLA inserts
  the gradient ``psum`` over ICI automatically;
* BatchNorm batch statistics are computed over the *global* batch (GSPMD
  turns the batch-mean into a cross-replica reduction) — sync-BN semantics,
  strictly better than the reference's per-replica DataParallel BN;
* buffers donated, so parameter memory is updated in place;
* one executable per bucketed image size; the multi-scale schedule never
  recompiles on the hot path (prewarm in the train CLI).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.loss import LossConfig, region_loss

__all__ = ["make_mesh", "batch_sharding", "replicated_sharding", "make_train_step",
           "loss_weights_from_config"]


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def make_mesh_for_batch(batch_size: int, axis: str = "data") -> Mesh:
    """Largest data mesh the batch shards evenly across (GSPMD requires the
    batch axis divisible by the mesh axis)."""
    n = len(jax.devices())
    while n > 1 and batch_size % n:
        n -= 1
    return make_mesh(n, axis)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis split across the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def loss_weights_from_config(config) -> dict[str, float]:
    get = lambda k, d: config.getfloat("loss", k, fallback=d)
    return {"coord": get("coord", 1.0), "object": get("object", 5.0),
            "noobject": get("noobject", 1.0), "cls": get("cls", 1.0),
            "prior": get("prior", 0.01)}


def make_train_step(model, optimizer: optax.GradientTransformation,
                    weights: dict[str, float], loss_cfg: LossConfig,
                    mesh: Mesh | None = None):
    """Build the jitted train step.

    step(params, state, opt_state, batch, seen) →
        (params, state, opt_state, metrics)

    ``batch`` is a dict with images (B,S,S,3) f32 and padded labels;
    ``seen`` is a replicated i32 scalar driving loss warmup.
    Distinct image sizes S produce distinct cached executables.
    """
    anchors = jnp.asarray(model.anchors)

    def step(params, state, opt_state, batch, seen):
        def loss_fn(p):
            raw, new_state = model.apply(p, state, batch["images"], train=True)
            comps = region_loss(raw, anchors, batch["yx_min"], batch["yx_max"],
                                batch["cls"], batch["valid"], seen, loss_cfg)
            total = sum(weights[k] * comps[k] for k in comps)
            return total, (comps, new_state)

        (total, (comps, new_state)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        metrics = dict(comps, total=total,
                       grad_norm=optax.global_norm(grads))
        return new_params, new_state, new_opt_state, metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0, 1, 2))

    repl = replicated_sharding(mesh)
    data = batch_sharding(mesh)
    batch_spec = {"images": data, "yx_min": data, "yx_max": data,
                  "cls": data, "valid": data}
    return jax.jit(
        step,
        in_shardings=(repl, repl, repl, batch_spec, repl),
        out_shardings=(repl, repl, repl, repl),
        donate_argnums=(0, 1, 2),
    )
