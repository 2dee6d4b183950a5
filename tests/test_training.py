"""Train-step tests: overfit sanity, mesh-sharded parity, checkpointing
(SURVEY.md §4: 2-image fake dataset e2e smoke on CPU; mesh-of-8 exercises the
sharded path without hardware)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from yolojax.models.darknet import Darknet, Tiny
from yolojax.models.mobilenet import MobileNet
from yolojax.ops.loss import LossConfig
from yolojax.parallel.mesh import (batch_sharding, make_mesh, make_train_step,
                                   replicated_sharding)
from yolojax.utils import checkpoint as ckpt

ANCHORS = np.asarray([[1.0, 1.0], [3.0, 3.0]], np.float32)
WEIGHTS = {"coord": 1.0, "object": 5.0, "noobject": 1.0, "cls": 1.0, "prior": 0.01}


def tiny_batch(rng, b=2, s=64, g=3):
    images = rng.uniform(0, 1, (b, s, s, 3)).astype(np.float32)
    center = rng.uniform(0.3, 0.7, (b, g, 2)).astype(np.float32)
    half = rng.uniform(0.1, 0.2, (b, g, 2)).astype(np.float32)
    return {
        "images": images,
        "yx_min": np.clip(center - half, 0, 1),
        "yx_max": np.clip(center + half, 0, 1),
        "cls": rng.integers(0, 4, (b, g)).astype(np.int32),
        "valid": np.ones((b, g), bool),
    }


def build(lr=1e-3, cls=Tiny):
    model = cls(anchors=ANCHORS, num_classes=4, dtype=jnp.float32)
    params, state = model.init(jax.random.PRNGKey(0))
    # clip as in the production config — raw-coord MSE gradients are spiky
    # at init (SURVEY.md §2.13 notes optional gradient clipping)
    opt = optax.chain(optax.clip_by_global_norm(5.0), optax.sgd(lr, momentum=0.9))
    opt_state = opt.init(params)
    return model, params, state, opt, opt_state


def test_overfit_two_images(rng):
    model, params, state, opt, opt_state = build(lr=2e-3)
    step = make_train_step(model, opt, WEIGHTS, LossConfig(warmup_seen=0))
    batch = tiny_batch(rng)
    seen = jnp.int32(0)
    first = None
    for i in range(30):
        params, state, opt_state, metrics = step(params, state, opt_state, batch, seen)
        if first is None:
            first = float(metrics["total"])
    last = float(metrics["total"])
    assert np.isfinite(last)
    assert last < first * 0.5, (first, last)


def test_metrics_components_present(rng):
    model, params, state, opt, opt_state = build()
    step = make_train_step(model, opt, WEIGHTS, LossConfig())
    _, _, _, metrics = step(params, state, opt_state, tiny_batch(rng), jnp.int32(0))
    assert {"coord", "object", "noobject", "cls", "prior", "total", "grad_norm",
            "grads"} <= set(metrics)
    # the grads pytree mirrors params (drives the grads/ histogram summaries)
    assert set(metrics["grads"]) == set(build()[1])


@pytest.mark.parametrize("cls", [Tiny, Darknet, MobileNet],
                         ids=["tiny", "darknet", "mobilenet"])
def test_mesh_sharded_step_matches_single_device(rng, cls):
    """Every backbone must shard: Darknet-19 exercises GSPMD propagation
    through the passthrough (darknet-order reorg reshape/transpose chains +
    concat) and MobileNet through grouped convs — the two places sharding
    surprises live (VERDICT r3 #1: the flagship had no >1-device evidence)."""
    assert jax.device_count() >= 8, "conftest should provide 8 cpu devices"
    batch = tiny_batch(rng, b=8)
    seen = jnp.int32(0)

    model, params, state, opt, opt_state = build(cls=cls)
    step1 = make_train_step(model, opt, WEIGHTS, LossConfig())
    p1, s1, o1, m1 = step1(params, state, opt_state, batch, seen)

    model, params, state, opt, opt_state = build(cls=cls)
    mesh = make_mesh(8)
    step8 = make_train_step(model, opt, WEIGHTS, LossConfig(), mesh=mesh)
    p8, s8, o8, m8 = step8(params, state, opt_state, batch, seen)

    for k in m1:
        if k == "grads":  # per-layer grad pytree (histogram summaries)
            continue
        np.testing.assert_allclose(float(m1[k]), float(m8[k]), rtol=5e-3, err_msg=k)
    # parameters after one update agree across the two lowerings
    f1 = jax.tree_util.tree_leaves(p1)
    f8 = jax.tree_util.tree_leaves(p8)
    for a, b in zip(f1, f8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_mesh_of_one_runs(rng):
    model, params, state, opt, opt_state = build()
    mesh = make_mesh(1)
    step = make_train_step(model, opt, WEIGHTS, LossConfig(), mesh=mesh)
    _, _, _, metrics = step(params, state, opt_state, tiny_batch(rng, b=2), jnp.int32(0))
    assert np.isfinite(float(metrics["total"]))


def test_checkpoint_roundtrip(tmp_path, rng):
    model, params, state, opt, opt_state = build()
    path = str(tmp_path / "10.npz")
    ckpt.save(path, {"params": params, "state": state, "opt": opt_state},
              {"step": 10, "seen": 320})
    trees, meta = ckpt.load(path, {"params": params, "state": state, "opt": opt_state})
    assert meta == {"step": 10, "seen": 320}
    for a, b in zip(jax.tree_util.tree_leaves(trees["params"]),
                    jax.tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_shape_mismatch_rejected(tmp_path):
    model, params, state, opt, opt_state = build()
    path = str(tmp_path / "1.npz")
    ckpt.save(path, {"params": params}, {})
    other = Tiny(anchors=ANCHORS, num_classes=7, dtype=jnp.float32)
    p2, _ = other.init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="shape"):
        ckpt.load(path, {"params": p2})


def test_saver_cadence_and_pruning(tmp_path):
    model, params, state, opt, opt_state = build()
    saver = ckpt.Saver(str(tmp_path), interval=10.0, keep=2)
    assert not saver.due(0.0)   # first call arms the timer
    assert not saver.due(5.0)
    assert saver.due(11.0)
    for i, t in enumerate([11.0, 22.0, 33.0]):
        saver(t, i, {"params": params}, {"step": i})
    files = sorted(os.listdir(tmp_path))
    assert files == ["1.npz", "2.npz"]
    assert ckpt.latest(str(tmp_path)).endswith("2.npz")


def test_optimizer_factories_from_config():
    import configparser

    from yolojax.utils.train import build_optimizer

    config = configparser.ConfigParser()
    config.add_section("train")
    config.set("train", "optimizer", "yolojax.utils.train.sgd")
    config.set("train", "learning_rate", "0.01")
    config.set("train", "milestones", "100,200")
    config.set("train", "gamma", "0.1")
    opt = build_optimizer(config)
    model, params, _, _, _ = build()
    opt_state = opt.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = opt.update(grads, opt_state, params)
    assert np.isfinite(float(optax.global_norm(updates)))


def test_sparsity_l1_hits_only_bn_gamma():
    """[train] sparsity adds lam*sign(gamma) to BN-scale grads and nothing
    else (network-slimming prunability training, scripts/prune_gate.py)."""
    from yolojax.utils.train import add_bn_l1

    lam = 0.25
    params = {"c1": {"w": jnp.ones((3, 3, 4, 8)),
                     "gamma": jnp.array([1.0, -2.0, 0.0, 3.0]),
                     "beta": jnp.zeros((4,))}}
    grads = jax.tree_util.tree_map(jnp.zeros_like, params)
    tx = add_bn_l1(lam)
    updates, _ = tx.update(grads, tx.init(params), params)
    np.testing.assert_allclose(np.asarray(updates["c1"]["gamma"]),
                               lam * np.sign([1.0, -2.0, 0.0, 3.0]))
    assert float(jnp.abs(updates["c1"]["w"]).max()) == 0.0
    assert float(jnp.abs(updates["c1"]["beta"]).max()) == 0.0
    # and the config path wires it into the sgd factory
    import configparser

    from yolojax.utils.train import build_optimizer

    config = configparser.ConfigParser()
    config.add_section("train")
    config.set("train", "sparsity", "0.25")
    config.set("train", "learning_rate", "1.0")
    config.set("train", "momentum", "0.0")
    config.set("train", "weight_decay", "0.0")
    opt = build_optimizer(config)
    updates, _ = opt.update(grads, opt.init(params), params)
    # sgd with lr 1.0 / no momentum: update == -(grad + lam*sign(gamma))
    np.testing.assert_allclose(np.asarray(updates["c1"]["gamma"]),
                               -lam * np.sign([1.0, -2.0, 0.0, 3.0]))


def test_fused_augment_step_mesh_matches_single(rng):
    """The augment-fused sharded step equals the unsharded fused step."""
    from yolojax.data.transform import TrainAugment

    aug = TrainAugment(hsv=False)  # deterministic enough across lowerings
    b, c, g, size = 8, 96, 3, 64
    center = rng.uniform(0.3, 0.7, (b, g, 2)).astype(np.float32)
    half = rng.uniform(0.05, 0.2, (b, g, 2)).astype(np.float32)
    batch = {
        "canvas": rng.integers(0, 255, (b, c, c, 3), dtype=np.uint8),
        "hw": np.full((b, 2), 80, np.float32),
        "yx_min": np.clip(center - half, 0, 1),
        "yx_max": np.clip(center + half, 0, 1),
        "cls": rng.integers(0, 4, (b, g)).astype(np.int32),
        "valid": np.ones((b, g), bool),
    }
    key = jax.random.PRNGKey(3)
    seen = jnp.int32(0)

    model, params, state, opt, opt_state = build()
    step1 = make_train_step(model, opt, WEIGHTS, LossConfig(), augment=aug)
    p1, s1, o1, m1 = step1(params, state, opt_state, batch, seen, key, size)

    model, params, state, opt, opt_state = build()
    step8 = make_train_step(model, opt, WEIGHTS, LossConfig(),
                            mesh=make_mesh(8), augment=aug)
    p8, s8, o8, m8 = step8(params, state, opt_state, batch, seen, key, size)

    for k in m1:
        if k == "grads":
            continue
        np.testing.assert_allclose(float(m1[k]), float(m8[k]), rtol=5e-3, err_msg=k)


def test_frozen_layers_receive_no_updates(rng):
    from yolojax.utils.train import with_frozen

    model, params, state, _, _ = build()
    opt = with_frozen(optax.sgd(0.1), params, ["c1", "c2"])
    opt_state = opt.init(params)
    step = make_train_step(model, opt, WEIGHTS, LossConfig())
    before = {k: np.asarray(v["w"]).copy() for k, v in params.items()}
    params, state, opt_state, _ = step(params, state, opt_state,
                                       tiny_batch(rng), jnp.int32(0))
    np.testing.assert_array_equal(np.asarray(params["c1"]["w"]), before["c1"])
    np.testing.assert_array_equal(np.asarray(params["c2"]["w"]), before["c2"])
    assert not np.array_equal(np.asarray(params["c7"]["w"]), before["c7"])


def _canvas_batches(rng, n, b=8, c=96, g=3):
    batches = []
    for _ in range(n):
        center = rng.uniform(0.3, 0.7, (b, g, 2)).astype(np.float32)
        half = rng.uniform(0.05, 0.2, (b, g, 2)).astype(np.float32)
        batches.append({
            "canvas": rng.integers(0, 255, (b, c, c, 3), dtype=np.uint8),
            "hw": np.full((b, 2), 80, np.float32),
            "yx_min": np.clip(center - half, 0, 1),
            "yx_max": np.clip(center + half, 0, 1),
            "cls": rng.integers(0, 4, (b, g)).astype(np.int32),
            "valid": np.ones((b, g), bool),
        })
    return batches


def test_overlap_device_puts_matches_serial(rng):
    """The double-buffered put thread (SURVEY §7 "overlap with compute via
    prefetch; double-buffer", VERDICT r4 #4) is a pure pipelining change:
    N steps through overlap_device_puts produce bit-identical params to the
    serial inline-put loop on the same host batches."""
    from yolojax.data.loader import overlap_device_puts
    from yolojax.data.transform import TrainAugment

    aug = TrainAugment(hsv=False)
    size, seen = 64, jnp.int32(0)
    batches = _canvas_batches(rng, 5)
    mesh = make_mesh(8)
    sharding = batch_sharding(mesh)

    def run(source):
        model, params, state, opt, opt_state = build()
        step = make_train_step(model, opt, WEIGHTS, LossConfig(),
                               mesh=mesh, augment=aug)
        for i, dev in enumerate(source):
            params, state, opt_state, _ = step(
                params, state, opt_state, dev, seen,
                jax.random.PRNGKey(100 + i), size)
        return jax.tree_util.tree_map(np.asarray, jax.device_get(params))

    serial = run(jax.device_put(b, sharding) for b in batches)
    overlapped = run(overlap_device_puts(
        iter(batches), lambda b: jax.device_put(b, sharding)))

    flat_s = {jax.tree_util.keystr(k): v for k, v
              in jax.tree_util.tree_flatten_with_path(serial)[0]}
    flat_o = {jax.tree_util.keystr(k): v for k, v
              in jax.tree_util.tree_flatten_with_path(overlapped)[0]}
    for name in flat_s:
        np.testing.assert_array_equal(flat_s[name], flat_o[name],
                                      err_msg=f"param {name} diverged")


def test_overlap_device_puts_propagates_errors():
    """A failing source (bad record mid-epoch) must re-raise at the consumer,
    not hang the queue or silently truncate — same contract as Loader.epoch."""
    from yolojax.data.loader import overlap_device_puts

    def source():
        yield {"x": np.zeros(3)}
        raise ValueError("bad record")

    it = overlap_device_puts(source(), lambda b: b, depth=2)
    next(it)
    with pytest.raises(ValueError, match="bad record"):
        next(it)
