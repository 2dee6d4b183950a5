"""Tools tests: anchor k-means, channel pruning, export round-trip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolojax.models import ChannelResolver
from yolojax.models.darknet import Darknet, Tiny
from yolojax.models.mobilenet import MobileNet
from yolojax.tools.kmeans import collect_hw, kmeans_anchors
from yolojax.tools.prune import prune

ANCHORS = np.asarray([[1.0, 1.0], [3.0, 3.0]], np.float32)


def test_kmeans_recovers_clusters(rng):
    # three tight clusters → centroids near them, high mean IoU
    centers = np.asarray([[1.0, 2.0], [4.0, 4.0], [8.0, 3.0]])
    hw = np.concatenate([c + rng.normal(0, 0.05, (100, 2)) for c in centers])
    anchors, mean_iou = kmeans_anchors(hw, 3, seed=0)
    assert mean_iou > 0.9
    got = anchors[np.argsort(anchors[:, 0])]
    want = centers[np.argsort(centers[:, 0])]
    np.testing.assert_allclose(got, want, atol=0.05)


def test_kmeans_handles_k_equals_n(rng):
    hw = rng.uniform(1, 5, (4, 2))
    anchors, mean_iou = kmeans_anchors(hw, 4, seed=1)
    assert mean_iou > 0.99  # every box its own centroid


def test_collect_hw_grid_units():
    from yolojax.data.cache import make_record

    recs = [make_record("p", [[0.0, 0.0]], [[0.5, 0.25]], [0])]
    hw = collect_hw(recs, grid=13)
    np.testing.assert_allclose(hw, [[6.5, 3.25]])


@pytest.mark.parametrize("cls", [Darknet, Tiny, MobileNet])
def test_prune_rebuilds_and_runs(cls, rng):
    model = cls(anchors=ANCHORS, num_classes=4, dtype=jnp.float32)
    params, state = model.init(jax.random.PRNGKey(0))
    new_params, new_state, channels = prune(model, params, state, ratio=0.25)
    assert channels  # something was pruned
    slim = cls(anchors=ANCHORS, num_classes=4, dtype=jnp.float32,
               width=ChannelResolver(channels))
    # slimmed params load into the slim architecture and forward runs
    raw, _ = slim.apply(new_params, new_state, jnp.zeros((1, 64, 64, 3)), train=False)
    assert raw.shape == (1, 2, 2, 2 * 9)


def test_prune_zero_gamma_channels_is_exact(rng):
    """Channels with γ=β=0 emit exactly 0 → removing them preserves outputs."""
    model = Tiny(anchors=ANCHORS, num_classes=4, dtype=jnp.float32)
    params, state = model.init(jax.random.PRNGKey(1))
    dead = {}
    for name, p in params.items():
        if "gamma" not in p:
            continue
        n = p["gamma"].shape[0]
        kill = np.zeros(n, bool)
        kill[rng.choice(n, size=max(1, n // 4), replace=False)] = True
        g = np.asarray(p["gamma"]).copy()
        bta = np.asarray(p["beta"]).copy()
        g[kill] = 0.0
        bta[kill] = 0.0
        p["gamma"], p["beta"] = jnp.asarray(g), jnp.asarray(bta)
        dead[name] = kill
    x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    before, _ = model.apply(params, state, x, train=False)

    # remove exactly the dead fraction (global quantile picks γ=0 first)
    total = sum(k.sum() for k in dead.values())
    num = sum(len(k) for k in dead.values())
    new_params, new_state, channels = prune(model, params, state,
                                            ratio=total / num)
    slim = Tiny(anchors=ANCHORS, num_classes=4, dtype=jnp.float32,
                width=ChannelResolver(channels))
    after, _ = slim.apply(new_params, new_state, x, train=False)
    np.testing.assert_allclose(np.asarray(before), np.asarray(after),
                               rtol=1e-4, atol=1e-4)


def test_prune_darknet_passthrough_consistency(rng):
    """Pruning across the reorg+concat passthrough keeps shapes consistent."""
    model = Darknet(anchors=ANCHORS, num_classes=4, dtype=jnp.float32)
    params, state = model.init(jax.random.PRNGKey(2))
    new_params, new_state, channels = prune(model, params, state, ratio=0.4)
    slim = Darknet(anchors=ANCHORS, num_classes=4, dtype=jnp.float32,
                   width=ChannelResolver(channels))
    for d in slim.layer_defs:
        w = np.asarray(new_params[d.name]["w"])
        assert w.shape == (d.ksize, d.ksize, d.in_ch // d.groups, d.out_ch), d.name
    raw, _ = slim.apply(new_params, new_state, jnp.zeros((1, 64, 64, 3)), train=False)
    assert raw.shape == (1, 2, 2, 18)


def test_export_stablehlo_roundtrip(rng, tmp_path):
    import jax.export

    from yolojax.ops.decode import decode_flat

    model = Tiny(anchors=ANCHORS, num_classes=4, dtype=jnp.float32)
    params, state = model.init(jax.random.PRNGKey(0))
    folded = model.fold(params, state)
    anchors_dev = jnp.asarray(ANCHORS)

    def fn(images):
        return decode_flat(model.apply_folded(folded, images), anchors_dev)

    spec = jax.ShapeDtypeStruct((1, 64, 64, 3), jnp.float32)
    exported = jax.export.export(jax.jit(fn))(spec)
    blob = exported.serialize()
    x = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    replay = jax.export.deserialize(blob).call(x)
    np.testing.assert_allclose(np.asarray(replay), np.asarray(fn(x)),
                               rtol=1e-5, atol=1e-5)
