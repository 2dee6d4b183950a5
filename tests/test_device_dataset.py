"""Device-resident dataset cache (data/device_cache.py): gather parity vs the
host loader path, Loader-identical epoch order, and sharded assembly on the
8-device CPU mesh."""

import jax
import numpy as np

from yolojax.data.dataset import Dataset, collate
from yolojax.data.device_cache import KEYS, DeviceDataset
from yolojax.data.loader import Loader
from yolojax.parallel.mesh import make_mesh


def fake_dataset(n=10, canvas=64, max_boxes=4, seed=0):
    rng = np.random.default_rng(seed)
    records = []
    for i in range(n):
        k = int(rng.integers(1, max_boxes + 1))
        mins = rng.uniform(0.0, 0.5, (k, 2)).astype(np.float32)
        records.append({
            "path": f"img{i}",
            "yx_min": mins,
            "yx_max": (mins + rng.uniform(0.1, 0.4, (k, 2))).clip(0, 1)
                      .astype(np.float32),
            "cls": rng.integers(0, 3, (k,)).astype(np.int32),
            "difficult": np.zeros((k,), bool),
        })

    def imread(path):
        r = np.random.default_rng(hash(path) % 2**31)
        return r.integers(0, 255, (48, 56, 3), dtype=np.uint8)

    return Dataset(records, canvas=canvas, max_boxes=max_boxes, imread=imread)


def test_gather_matches_host_collate():
    ds = fake_dataset()
    dd = DeviceDataset(ds, make_mesh(1), batch_size=4, seed=0)
    idx = np.asarray([7, 0, 3, 3], np.int32)  # repeats allowed (sampling)
    got = dd.gather(idx)
    want = collate([ds.load(int(i)) for i in idx])
    assert set(got) == set(KEYS)
    for k in KEYS:
        np.testing.assert_array_equal(np.asarray(got[k]), want[k], err_msg=k)


def test_epoch_order_matches_loader():
    """Same seed => the device path trains on the Loader's exact batches
    (single-process), so switching modes preserves the data schedule."""
    ds = fake_dataset(n=9)
    loader_batches = []
    loader = Loader(ds, 4, workers=1, seed=5)
    for i, b in enumerate(loader.epoch()):
        loader_batches.append(b)
    dd = DeviceDataset(ds, make_mesh(1), batch_size=4, seed=5)
    it = iter(dd)
    for want in loader_batches:
        got = next(it)
        np.testing.assert_array_equal(np.asarray(got["canvas"]), want["canvas"])
        np.testing.assert_array_equal(np.asarray(got["cls"]), want["cls"])


def test_sharded_gather_on_mesh():
    assert jax.device_count() >= 8
    ds = fake_dataset(n=16)
    mesh = make_mesh(8)
    dd = DeviceDataset(ds, mesh, batch_size=8, seed=1)
    batch = next(iter(dd))
    # the batch axis is split over the data mesh, ready for the fused step
    assert len(batch["canvas"].sharding.device_set) == 8
    assert batch["canvas"].shape == (8, 64, 64, 3)
    np.testing.assert_array_equal(
        np.asarray(batch["valid"]).any(axis=1), np.ones(8, bool))


def test_gathered_batch_feeds_fused_sharded_step(rng):
    """The gathered batch drives the augment-fused mesh step unchanged."""
    import jax.numpy as jnp
    import optax

    from yolojax.data.transform import TrainAugment
    from yolojax.models.darknet import Tiny
    from yolojax.ops.loss import LossConfig
    from yolojax.parallel.mesh import make_train_step

    ds = fake_dataset(n=8, canvas=96)
    mesh = make_mesh(8)
    dd = DeviceDataset(ds, mesh, batch_size=8, seed=0)
    batch = next(iter(dd))
    batch["hw"] = batch["hw"].astype(jnp.float32)

    anchors = np.asarray([[1.0, 1.0], [3.0, 3.0]], np.float32)
    model = Tiny(anchors=anchors, num_classes=3, dtype=jnp.float32)
    params, state = model.init(jax.random.PRNGKey(0))
    opt = optax.sgd(1e-3)
    step = make_train_step(
        model, opt, {"coord": 1.0, "object": 5.0, "noobject": 1.0,
                     "cls": 1.0, "prior": 0.01},
        LossConfig(), mesh=mesh, augment=TrainAugment(hsv=False))
    _, _, _, metrics = step(params, state, opt.init(params), batch,
                            jnp.int32(0), jax.random.PRNGKey(1), 64)
    assert np.isfinite(float(metrics["total"]))
