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
           "loss_weights_from_config", "shard_host_batch"]


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def make_mesh_for_batch(batch_size: int, axis: str = "data") -> Mesh:
    """Largest data mesh the batch shards evenly across (GSPMD requires the
    batch axis divisible by the mesh axis).

    ``batch_size`` is per process; multi-host, the global batch is
    ``batch_size * process_count`` over the full pod mesh (each process
    contributes its local shard via :func:`shard_host_batch`).
    """
    n = len(jax.devices())
    global_batch = batch_size * jax.process_count()
    while n > 1 and (global_batch % n or n % jax.process_count()):
        n -= 1
    return make_mesh(n, axis)


def shard_host_batch(mesh: Mesh, batch: dict):
    """Assemble per-process numpy batches into global device arrays.

    Single-process (the common case, incl. the 8-device CPU dryrun) this is a
    no-op — jit consumes host numpy directly against the local mesh.  On a
    multi-host pod, each process's loader yields a *disjoint* host-local batch
    (Loader shard=(process_index, process_count)); jit over a multi-process
    mesh cannot ingest host-local numpy, so build the global array explicitly
    (global batch axis = batch_size * process_count) with the batch sharding.
    """
    if jax.process_count() == 1:
        return batch
    data = batch_sharding(mesh)
    return {k: jax.make_array_from_process_local_data(data, np.asarray(v))
            for k, v in batch.items()}


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
                    mesh: Mesh | None = None, augment=None):
    """Build the jitted train step.

    Without ``augment``:
        step(params, state, opt_state, batch, seen)
    with ``batch`` = {images (B,S,S,3) f32, yx_min, yx_max, cls, valid}.

    With ``augment`` (a TrainAugment), the fused augmentation graph becomes
    part of the same SPMD program:
        step(params, state, opt_state, batch, seen, key, out_size)
    with ``batch`` = {canvas (B,C,C,3) u8, hw, yx_min, yx_max, cls, valid}
    and static ``out_size`` — so the decode-to-normalized → crop/flip/HSV →
    forward → loss → update pipeline is ONE executable per bucketed size,
    and under a mesh the augmentation itself is data-parallel (the
    standalone-augment variant would materialize images on one device and
    reshard every step).

    ``seen`` is a replicated i32 scalar driving loss warmup.
    """
    anchors = jnp.asarray(model.anchors)

    def _update(params, state, opt_state, images, yx_min, yx_max, cls, valid, seen):
        def loss_fn(p):
            raw, new_state = model.apply(p, state, images, train=True)
            comps = region_loss(raw, anchors, yx_min, yx_max, cls, valid,
                                seen, loss_cfg)
            total = sum(weights[k] * comps[k] for k in comps)
            return total, (comps, new_state)

        (total, (comps, new_state)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        # grads ride along for the [summary] histogram cadence (SURVEY.md
        # §2.13 "histograms of params/grads"); they are already materialized
        # by value_and_grad, and the host only fetches them when due
        metrics = dict(comps, total=total,
                       grad_norm=optax.global_norm(grads), grads=grads)
        return new_params, new_state, new_opt_state, metrics

    if augment is None:
        def step(params, state, opt_state, batch, seen):
            return _update(params, state, opt_state, batch["images"],
                           batch["yx_min"], batch["yx_max"], batch["cls"],
                           batch["valid"], seen)

        donate, n_repl_tail = (0, 1, 2), 1
    else:
        def step(params, state, opt_state, batch, seen, key, out_size: int):
            images, ymin, ymax, valid = augment(
                key, batch["canvas"], batch["hw"], batch["yx_min"],
                batch["yx_max"], batch["valid"], out_size)
            return _update(params, state, opt_state, images, ymin, ymax,
                           batch["cls"], valid, seen)

        donate, n_repl_tail = (0, 1, 2), 2

    if mesh is None:
        return jax.jit(step, donate_argnums=donate,
                       static_argnums=() if augment is None else (6,))

    repl = replicated_sharding(mesh)
    data = batch_sharding(mesh)
    keys = (("canvas", "hw") if augment is not None else ("images",)) + (
        "yx_min", "yx_max", "cls", "valid")
    batch_spec = {k: data for k in keys}
    return jax.jit(
        step,
        in_shardings=(repl, repl, repl, batch_spec) + (repl,) * n_repl_tail,
        out_shardings=(repl, repl, repl, repl),
        donate_argnums=donate,
        static_argnums=() if augment is None else (6,),
    )
