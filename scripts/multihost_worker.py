#!/usr/bin/env python
"""One process of a multi-host data-parallel training run (SURVEY.md §2.17:
"multi-host dataloading sharded per process over DCN"; VERDICT r2 #3).

Spawned once per simulated host by tests/test_multihost.py (and usable
manually): each process owns 4 virtual CPU devices, joins the pod via
``jax.distributed.initialize``, feeds its *disjoint* Loader shard
(``shard=(process_index, process_count)``), assembles the global batch with
``parallel.mesh.shard_host_batch`` (→ ``make_array_from_process_local_data``),
and runs the real fused-augment sharded train step.  Process 0 saves the
final replicated params + per-step loss history for the parity assertion
against a single-process run on identical data.
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pid", type=int, required=True)
    ap.add_argument("--nprocs", type=int, default=2)
    ap.add_argument("--local-devices", type=int, default=4)
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--records", required=True, help="pickled cache records")
    ap.add_argument("--out", required=True)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--local-batch", type=int, default=4)
    ap.add_argument("--canvas", type=int, default=96)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--classes", type=int, default=2)
    ap.add_argument("--backbone", choices=("tiny", "darknet", "mobilenet"),
                    default="tiny",
                    help="darknet puts the flagship's passthrough "
                         "(reorg+concat) on the pod mesh (VERDICT r3 #1)")
    ap.add_argument("--device-dataset", action="store_true",
                    help="feed batches through DeviceDataset instead of the "
                         "Loader: executes its process_count>1 branch for "
                         "real — the make_array_from_callback replicated "
                         "upload and the jitted gather fed host-numpy "
                         "indices over a multi-process mesh (VERDICT r4 #2)")
    args = ap.parse_args()

    import jax

    # before any backend query: CPU platform with N virtual local devices
    # (the axon site hook pre-imports jax; see DEVNOTES.md)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", args.local_devices)
    jax.distributed.initialize(f"localhost:{args.port}",
                               num_processes=args.nprocs,
                               process_id=args.pid)
    assert jax.process_count() == args.nprocs
    assert jax.local_device_count() == args.local_devices

    import jax.numpy as jnp
    import numpy as np
    import optax

    from yolojax.data.dataset import Dataset
    from yolojax.data.loader import Loader
    from yolojax.data.transform import TrainAugment
    from yolojax.models.darknet import Darknet, Tiny
    from yolojax.models.mobilenet import MobileNet
    from yolojax.ops.loss import LossConfig
    from yolojax.parallel.mesh import (make_mesh, make_train_step,
                                       shard_host_batch)

    with open(args.records, "rb") as f:
        records = pickle.load(f)
    dataset = Dataset(records, canvas=args.canvas, max_boxes=5)
    if args.device_dataset:
        from yolojax.data.device_cache import DeviceDataset
        from yolojax.parallel.mesh import make_mesh
        pod_mesh = make_mesh()
        loader = DeviceDataset(dataset, pod_mesh, args.local_batch, seed=0)
    else:
        loader = Loader(dataset, args.local_batch, workers=1, seed=0,
                        shard=(jax.process_index(), jax.process_count()))

    anchors = np.asarray([[1.0, 1.0], [3.0, 3.0]], np.float32)
    cls = {"tiny": Tiny, "darknet": Darknet, "mobilenet": MobileNet}[args.backbone]
    model = cls(anchors=anchors, num_classes=args.classes, dtype=jnp.float32)
    params, state = model.init(jax.random.PRNGKey(0))
    opt = optax.chain(optax.clip_by_global_norm(5.0),
                      optax.sgd(1e-3, momentum=0.9))
    opt_state = opt.init(params)

    mesh = make_mesh()          # full pod: nprocs * local_devices
    assert mesh.devices.size == args.nprocs * args.local_devices
    step = make_train_step(model, opt, {"coord": 1.0, "object": 5.0,
                                        "noobject": 1.0, "cls": 1.0,
                                        "prior": 0.01},
                           LossConfig(warmup_seen=0), mesh=mesh,
                           augment=TrainAugment(hsv=False))

    losses = []
    it = iter(loader)
    for i in range(args.steps):
        host_batch = next(it)
        if args.device_dataset:
            # DeviceDataset batches are already global device arrays with
            # the batch sharding — no host assembly step
            batch = host_batch
        else:
            batch = shard_host_batch(mesh, {
                k: host_batch[k] for k in
                ("canvas", "hw", "yx_min", "yx_max", "cls", "valid")})
        params, state, opt_state, metrics = step(
            params, state, opt_state, batch, jnp.int32(0),
            jax.random.PRNGKey(100 + i), args.size)
        losses.append(float(jax.device_get(metrics["total"])))
        print(f"p{args.pid} step {i}: loss {losses[-1]:.6f}", flush=True)

    if jax.process_index() == 0:
        out = {"losses": losses,
               "params": jax.tree_util.tree_map(
                   lambda a: np.asarray(jax.device_get(a)), params)}
        with open(os.path.join(args.out, "multihost_result.pkl"), "wb") as f:
            pickle.dump(out, f)
    # all processes must reach shutdown together (collectives block)
    jax.distributed.shutdown()
    print(f"p{args.pid}: done", flush=True)


if __name__ == "__main__":
    main()
