"""Model zoo structural tests (SURVEY.md §2.6–2.8 contracts)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolojax.models import ChannelResolver
from yolojax.models.darknet import Darknet, Tiny
from yolojax.models.mobilenet import MobileNet

ANCHORS = np.asarray([[1.73145, 1.3221], [4.00944, 3.19275], [8.09892, 5.05587],
                      [4.84053, 9.47112], [10.0071, 11.2364]], np.float32)


def make(cls, **kw):
    kw.setdefault("dtype", jnp.float32)  # exact fold-parity checks on CPU
    return cls(anchors=ANCHORS, num_classes=20, **kw)


@pytest.mark.parametrize("cls", [Darknet, Tiny, MobileNet])
def test_output_shape_stride32(cls):
    model = make(cls)
    params, state = model.init(jax.random.PRNGKey(0))
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    raw, new_state = model.apply(params, state, x, train=False)
    assert raw.shape == (2, 2, 2, 5 * 25)


@pytest.mark.parametrize("cls", [Darknet, Tiny, MobileNet])
def test_train_mode_updates_bn_state(cls, rng):
    model = make(cls)
    params, state = model.init(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32))
    _, new_state = model.apply(params, state, x, train=True)
    changed = jax.tree_util.tree_reduce(
        lambda acc, pair: acc or not np.allclose(pair[0], pair[1]),
        jax.tree_util.tree_map(lambda a, b: (np.asarray(a), np.asarray(b)), state, new_state),
        False, is_leaf=lambda v: isinstance(v, tuple))
    assert changed


@pytest.mark.parametrize("cls", [Darknet, Tiny, MobileNet])
def test_fold_bn_matches_eval_forward(cls, rng):
    model = make(cls)
    params, state = model.init(jax.random.PRNGKey(1))
    # non-trivial BN stats/affine so folding is actually exercised
    params = jax.tree_util.tree_map(lambda p: p, params)
    for name, p in params.items():
        if "gamma" in p:
            p["gamma"] = p["gamma"] * 1.3 + 0.1
            p["beta"] = p["beta"] + 0.2
            state[name]["mean"] = jnp.asarray(rng.normal(0, 0.1, p["gamma"].shape), jnp.float32)
            state[name]["var"] = jnp.asarray(rng.uniform(0.5, 1.5, p["gamma"].shape), jnp.float32)
    x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    raw_eval, _ = model.apply(params, state, x, train=False)
    folded = model.fold(params, state)
    raw_folded = model.apply_folded(folded, x)
    # folding reassociates the affine math; allow f32 accumulation noise
    np.testing.assert_allclose(np.asarray(raw_eval), np.asarray(raw_folded),
                               rtol=1e-3, atol=1e-2)


def test_darknet_passthrough_wiring():
    model = make(Darknet)
    defs = {d.name: d for d in model.layer_defs}
    assert defs["c21"].in_ch == 512        # 26×26×512 passthrough source
    assert defs["c22"].in_ch == 1024 + 64 * 4  # top 1024 + reorg(64ch)*4
    assert defs["out"].out_ch == 5 * 25
    assert not defs["out"].bn and not defs["out"].act
    # darknet weight-file order
    names = [d.name for d in model.layer_defs]
    assert names == [f"c{i}" for i in range(1, 23)] + ["out"]


def test_tiny_has_nine_convs():
    model = make(Tiny)
    assert len(model.layer_defs) == 9


def test_mobilenet_depthwise_structure():
    model = make(MobileNet)
    defs = {d.name: d for d in model.layer_defs}
    assert defs["dw1"].groups == defs["dw1"].in_ch == 32
    assert defs["dw1"].out_ch == 32
    assert defs["pw13"].out_ch == 1024
    assert defs["c21"].in_ch == 512


def test_channel_resolver_prunes_widths():
    model = make(Darknet, width=ChannelResolver({"c2": 48, "c14": 768}))
    defs = {d.name: d for d in model.layer_defs}
    assert defs["c2"].out_ch == 48 and defs["c3"].in_ch == 48
    assert defs["c14"].out_ch == 768 and defs["c15"].in_ch == 768
    params, state = model.init(jax.random.PRNGKey(0))
    raw, _ = model.apply(params, state, jnp.zeros((1, 64, 64, 3)), train=False)
    assert raw.shape == (1, 2, 2, 125)


def test_inference_detect_fn_shapes(rng):
    from yolojax.models.inference import Inference
    model = make(Tiny)
    params, state = model.init(jax.random.PRNGKey(0))
    inf = Inference(model)
    folded = inf.fold(params, state)
    run = inf.detect_fn(threshold=0.01, overlap=0.45, topk=7)
    out = run(folded, jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)))
    assert out.conf.shape == (2, 20, 7)
    assert out.yx_min.shape == (2, 20, 7, 2)
    assert out.keep.dtype == bool


def test_detect_fn_host_matches_device_path(rng):
    """Native-NMS host detect path returns the same packed results."""
    from yolojax.native import native_nms_available

    if not native_nms_available():
        import pytest

        pytest.skip("no C++ toolchain")
    from yolojax.models.inference import Inference

    model = make(Tiny)
    params, state = model.init(jax.random.PRNGKey(0))
    inf = Inference(model)
    folded = inf.fold(params, state)
    images = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32))
    a = inf.detect_fn(0.01, 0.45, 7)(folded, images)
    h = inf.detect_fn_host(0.01, 0.45, 7)(folded, images)
    np.testing.assert_array_equal(np.asarray(a.keep), np.asarray(h.keep))
    keep = np.asarray(a.keep)
    np.testing.assert_allclose(np.where(keep, np.asarray(a.conf), 0),
                               np.where(keep, np.asarray(h.conf), 0), atol=1e-5)
    np.testing.assert_allclose(np.where(keep[..., None], np.asarray(a.yx_min), 0),
                               np.where(keep[..., None], np.asarray(h.yx_min), 0),
                               atol=1e-5)


@pytest.mark.parametrize("cls", [Tiny, Darknet, MobileNet],
                         ids=["tiny", "darknet", "mobilenet"])
def test_detect_fn_mesh_matches_single(rng, cls):
    """Mesh-sharded batched inference equals the single-device program —
    for every backbone (Darknet covers the passthrough reorg+concat under
    GSPMD, VERDICT r3 #1)."""
    from yolojax.models.inference import Inference
    from yolojax.parallel.mesh import make_mesh

    model = make(cls)
    params, state = model.init(jax.random.PRNGKey(0))
    inf = Inference(model)
    folded = inf.fold(params, state)
    images = jnp.asarray(rng.uniform(0, 1, (8, 64, 64, 3)).astype(np.float32))
    a = inf.detect_fn(0.01, 0.45, 7)(folded, images)
    m = inf.detect_fn(0.01, 0.45, 7, mesh=make_mesh(8))(folded, images)
    np.testing.assert_array_equal(np.asarray(a.keep), np.asarray(m.keep))
    keep = np.asarray(a.keep)
    np.testing.assert_allclose(np.where(keep, np.asarray(a.conf), 0),
                               np.where(keep, np.asarray(m.conf), 0), atol=1e-5)
