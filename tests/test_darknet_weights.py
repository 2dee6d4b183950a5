"""Darknet .weights import/export: round-trip + golden layout tests
(SURVEY.md §3.5 — layer-ordering contract is the critical invariant)."""

import io
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolojax.models.darknet import Darknet, Tiny
from yolojax.tools.darknet import head_permutation, load_weights, save_weights

ANCHORS = np.asarray([[1.0, 1.0], [2.0, 3.0]], np.float32)


def make_tiny(num_classes=3):
    return Tiny(anchors=ANCHORS, num_classes=num_classes, dtype=jnp.float32)


def test_head_permutation_is_involution():
    perm = head_permutation(5, 20)
    assert np.array_equal(perm[perm], np.arange(5 * 25))


def test_roundtrip_preserves_params(tmp_path, rng):
    model = make_tiny()
    params, state = model.init(jax.random.PRNGKey(0))
    # randomize BN stats so they round-trip nontrivially
    for name in state:
        state[name]["mean"] = jnp.asarray(rng.normal(size=state[name]["mean"].shape), jnp.float32)
        state[name]["var"] = jnp.asarray(rng.uniform(0.5, 2, state[name]["var"].shape), jnp.float32)
    path = str(tmp_path / "w.weights")
    save_weights(path, model, params, state, seen=12800)
    p2, s2, seen = load_weights(path, model)
    assert seen == 12800
    flat1, _ = jax.tree_util.tree_flatten((params, state))
    flat2, _ = jax.tree_util.tree_flatten((p2, s2))
    for a, b in zip(flat1, flat2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_golden_single_conv_layout(tmp_path):
    """Hand-build a weights file for a 1-conv model and check exact placement."""

    class OneConv:
        anchors = ANCHORS
        num_classes = 3

        @property
        def layer_defs(self):
            from yolojax.models import LayerDef
            d = LayerDef("c1", 2, 1, bn=True)
            d.in_ch = 3
            return [d]

    n, in_ch, k = 2, 3, 1
    beta = np.asarray([1, 2], np.float32)
    gamma = np.asarray([3, 4], np.float32)
    mean = np.asarray([5, 6], np.float32)
    var = np.asarray([7, 8], np.float32)
    w_oihw = np.arange(n * in_ch * k * k, dtype=np.float32).reshape(n, in_ch, k, k)
    buf = io.BytesIO()
    buf.write(np.asarray([0, 2, 0], np.int32).tobytes())
    buf.write(np.asarray([42], np.uint64).tobytes())
    for arr in (beta, gamma, mean, var, w_oihw):
        buf.write(arr.tobytes())
    path = str(tmp_path / "one.weights")
    with open(path, "wb") as f:
        f.write(buf.getvalue())

    model = OneConv()
    params, state, seen = load_weights(path, model)
    assert seen == 42
    np.testing.assert_array_equal(params["c1"]["beta"], beta)
    np.testing.assert_array_equal(params["c1"]["gamma"], gamma)
    np.testing.assert_array_equal(state["c1"]["mean"], mean)
    np.testing.assert_array_equal(state["c1"]["var"], var)
    # OIHW → HWIO; no head permutation since out_ch != A*(5+C) (the guard
    # lets classification-pretrained trunks import unchanged)
    hwio = w_oihw.transpose(2, 3, 1, 0)
    np.testing.assert_array_equal(np.asarray(params["c1"]["w"]), hwio)


def test_old_header_uses_uint32_seen(tmp_path):
    model = make_tiny()
    params, state = model.init(jax.random.PRNGKey(0))
    path = str(tmp_path / "w.weights")
    save_weights(path, model, params, state, seen=7)
    # rewrite header as pre-v2 (major=0, minor=1) with uint32 seen
    data = bytearray(open(path, "rb").read())
    new = np.asarray([0, 1, 0], np.int32).tobytes() + np.asarray([7], np.uint32).tobytes()
    data = new + bytes(data[20:])
    with open(path, "wb") as f:
        f.write(data)
    _, _, seen = load_weights(path, model)
    assert seen == 7


def test_truncated_and_oversized_files_rejected(tmp_path):
    model = make_tiny()
    params, state = model.init(jax.random.PRNGKey(0))
    path = str(tmp_path / "w.weights")
    save_weights(path, model, params, state)
    data = open(path, "rb").read()
    bad = str(tmp_path / "bad.weights")
    with open(bad, "wb") as f:
        f.write(data[:-8])
    with pytest.raises(ValueError, match="truncated"):
        load_weights(bad, model)
    with open(bad, "wb") as f:
        f.write(data + b"\x00" * 8)
    with pytest.raises(ValueError, match="not fully consumed"):
        load_weights(bad, model)


def test_imported_weights_forward_matches_original(tmp_path, rng):
    """End-to-end: save → load → identical forward pass (Darknet-19)."""
    model = Darknet(anchors=ANCHORS, num_classes=3, dtype=jnp.float32)
    params, state = model.init(jax.random.PRNGKey(2))
    path = str(tmp_path / "d19.weights")
    save_weights(path, model, params, state)
    p2, s2, _ = load_weights(path, model)
    x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    a, _ = model.apply(params, state, x, train=False)
    b, _ = model.apply(p2, s2, x, train=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_reinit_head_on_class_mismatch(tmp_path, rng):
    """Finetune path: weights trained for another class count import with a
    fresh head (SURVEY.md §2.13)."""
    donor = Tiny(anchors=ANCHORS, num_classes=7, dtype=jnp.float32)
    d_params, d_state = donor.init(jax.random.PRNGKey(0))
    path = str(tmp_path / "donor.weights")
    save_weights(path, donor, d_params, d_state, seen=5)

    target = make_tiny(num_classes=3)
    with pytest.raises(ValueError):
        load_weights(path, target)  # strict mode still rejects
    params, state, seen = load_weights(path, target, reinit_head_on_mismatch=True)
    assert seen == 5
    # trunk transferred exactly; head shaped for the new class count
    np.testing.assert_array_equal(np.asarray(params["c1"]["w"]),
                                  np.asarray(d_params["c1"]["w"]))
    assert params["out"]["w"].shape[-1] == 2 * (5 + 3)


def test_reinit_head_rejects_garbage_tail(tmp_path, rng):
    model = make_tiny()
    params, state = model.init(jax.random.PRNGKey(0))
    path = str(tmp_path / "w.weights")
    save_weights(path, model, params, state)
    data = open(path, "rb").read() + b"\x00" * 12  # not a whole out-channel
    bad = str(tmp_path / "bad.weights")
    with open(bad, "wb") as f:
        f.write(data)
    with pytest.raises(ValueError, match="head mismatch"):
        load_weights(bad, model, reinit_head_on_mismatch=True)
