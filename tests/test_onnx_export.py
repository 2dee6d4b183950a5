"""ONNX export verification (SURVEY.md §2.17, VERDICT round-1 missing #3).

No ``onnx``/``onnxruntime`` exists in this image, so the emitted file is
verified the hard way: a generic protobuf wire-format decoder re-parses the
bytes into the ModelProto structure, and an independent interpreter executes
the graph with numpy/torch implementations keyed ONLY on documented ONNX op
semantics (Conv/LeakyRelu/MaxPool/Reshape/Transpose/Concat/Slice/Sigmoid/
Exp/Clip/Softmax/elementwise).  Its output must match the jax inference path
(decode_flat contract).  A field-number or op-semantics mistake in the
exporter shows up as either a parse failure or a numeric mismatch.
"""

import numpy as np
import pytest

# ------------------------------------------------- generic protobuf decoder --


def _read_varint(buf, i):
    v = s = 0
    while True:
        b = buf[i]
        i += 1
        v |= (b & 0x7F) << s
        if not b & 0x80:
            return v, i
        s += 7


def pb_decode(buf):
    """bytes → {field_number: [raw values]} (varints as int, LEN as bytes)."""
    out = {}
    i = 0
    while i < len(buf):
        key, i = _read_varint(buf, i)
        field, wire = key >> 3, key & 7
        if wire == 0:
            v, i = _read_varint(buf, i)
        elif wire == 2:
            n, i = _read_varint(buf, i)
            v = bytes(buf[i:i + n])
            i += n
        elif wire == 5:
            v = bytes(buf[i:i + 4])
            i += 4
        elif wire == 1:
            v = bytes(buf[i:i + 8])
            i += 8
        else:
            raise ValueError(f"wire type {wire}")
        out.setdefault(field, []).append(v)
    return out


def _packed_i64(b):
    vals, i = [], 0
    while i < len(b):
        v, i = _read_varint(b, i)
        if v >= 1 << 63:
            v -= 1 << 64
        vals.append(v)
    return vals


def _parse_tensor(b):
    f = pb_decode(b)
    dims = _packed_i64(f[1][0]) if 1 in f else []
    dt = f[2][0]
    name = f[8][0].decode()
    dtype = {1: np.float32, 7: np.int64}[dt]
    arr = np.frombuffer(f[9][0], dtype).reshape(dims)
    return name, arr


def _parse_attr(b):
    f = pb_decode(b)
    name = f[1][0].decode()
    at = f[20][0]
    if at == 1:
        return name, np.frombuffer(f[2][0], np.float32)[0]
    if at == 2:
        v = f[3][0]
        return name, v - (1 << 64) if v >= 1 << 63 else v
    if at == 3:
        return name, f[4][0].decode()
    if at == 7:
        return name, _packed_i64(f[8][0])
    raise ValueError(f"attr type {at}")


def _parse_node(b):
    f = pb_decode(b)
    return {
        "inputs": [s.decode() for s in f.get(1, [])],
        "outputs": [s.decode() for s in f.get(2, [])],
        "op": f[4][0].decode(),
        "attrs": dict(_parse_attr(a) for a in f.get(5, [])),
    }


def parse_model(buf):
    """ModelProto bytes → (ir_version, opset, graph dict)."""
    f = pb_decode(buf)
    ir = f[1][0]
    ops = pb_decode(f[8][0])
    opset = ops[2][0]
    g = pb_decode(f[7][0])
    nodes = [_parse_node(n) for n in g[1]]
    inits = dict(_parse_tensor(t) for t in g.get(5, []))

    def _io_name(vb):
        return pb_decode(vb)[1][0].decode()

    return {
        "ir_version": ir, "opset": opset, "nodes": nodes, "inits": inits,
        "inputs": [_io_name(v) for v in g.get(11, [])],
        "outputs": [_io_name(v) for v in g.get(12, [])],
    }


# -------------------------------------- independent ONNX-semantics executor --


def run_onnx(model, feeds):
    """Execute the parsed graph with torch/numpy ops (independent of jax)."""
    import torch
    import torch.nn.functional as F

    env = dict(model["inits"])
    env.update(feeds)
    for n in model["nodes"]:
        x = [env[i] for i in n["inputs"]]
        a = n["attrs"]
        op = n["op"]
        if op == "Conv":
            assert a["pads"][:2] == a["pads"][2:], "asymmetric conv pads"
            t = F.conv2d(torch.from_numpy(np.ascontiguousarray(x[0])),
                         torch.from_numpy(np.ascontiguousarray(x[1])),
                         torch.from_numpy(np.ascontiguousarray(x[2])),
                         stride=a["strides"], padding=a["pads"][:2],
                         groups=a.get("group", 1))
            y = t.numpy()
        elif op == "LeakyRelu":
            y = np.where(x[0] >= 0, x[0], np.float32(a["alpha"]) * x[0])
        elif op == "MaxPool":
            p = a["pads"]  # [top, left, bottom, right]
            t = torch.from_numpy(np.ascontiguousarray(x[0]))
            t = F.pad(t, (p[1], p[3], p[0], p[2]), value=-np.inf)
            y = F.max_pool2d(t, a["kernel_shape"], a["strides"]).numpy()
        elif op == "Reshape":
            shape = [x[0].shape[i] if d == 0 else int(d)
                     for i, d in enumerate(x[1])]
            y = x[0].reshape(shape)
        elif op == "Transpose":
            y = x[0].transpose(a["perm"])
        elif op == "Concat":
            y = np.concatenate(x, axis=a["axis"])
        elif op == "Slice":
            starts, ends, axes = (list(v) for v in x[1:4])
            sl = [slice(None)] * x[0].ndim
            for s, e, ax in zip(starts, ends, axes):
                sl[ax] = slice(int(s), int(e))
            y = x[0][tuple(sl)]
        elif op == "Sigmoid":
            y = 1.0 / (1.0 + np.exp(-x[0]))
        elif op == "Exp":
            y = np.exp(x[0])
        elif op == "Clip":
            y = np.clip(x[0], x[1], x[2])
        elif op == "Softmax":
            ax = a.get("axis", 1)
            e = np.exp(x[0] - x[0].max(axis=ax, keepdims=True))
            y = e / e.sum(axis=ax, keepdims=True)
        elif op == "Add":
            y = x[0] + x[1]
        elif op == "Sub":
            y = x[0] - x[1]
        elif op == "Mul":
            y = x[0] * x[1]
        elif op == "Div":
            y = x[0] / x[1]
        elif op == "Identity":
            y = x[0]
        else:
            raise ValueError(f"unhandled op {op}")
        env[n["outputs"][0]] = np.asarray(y)
    return {o: env[o] for o in model["outputs"]}


# ----------------------------------------------------------------- fixtures --


def _export_and_run(model_cls, size, reorg_order="darknet", batch=2, seed=0):
    import jax
    import jax.numpy as jnp

    from yolojax.ops.decode import decode_flat
    from yolojax.tools.onnx_export import export_onnx

    anchors = np.asarray([[1.2, 0.9], [3.1, 2.4]], np.float32)
    model = model_cls(anchors=anchors, num_classes=4, dtype=jnp.float32,
                      reorg_order=reorg_order)
    params, state = model.init(jax.random.PRNGKey(seed))
    folded = model.fold(params, state)

    blob = export_onnx(model, folded, anchors, size, batch=batch)
    parsed = parse_model(blob)

    rng = np.random.default_rng(seed)
    images = rng.uniform(0, 1, (batch, 3, size, size)).astype(np.float32)
    got = run_onnx(parsed, {"images": images})["detections"]

    nhwc = images.transpose(0, 2, 3, 1)
    raw = model.apply_folded(folded, jnp.asarray(nhwc))
    want = np.asarray(decode_flat(raw, jnp.asarray(anchors)))
    return parsed, got, want


def test_onnx_structure_tiny():
    parsed, _, _ = _export_and_run(_tiny(), 64)
    assert parsed["ir_version"] == 6 and parsed["opset"] == 11
    assert parsed["inputs"] == ["images"]
    assert parsed["outputs"] == ["detections"]
    ops = [n["op"] for n in parsed["nodes"]]
    assert ops.count("Conv") == 9 and ops.count("MaxPool") == 6
    assert ops.count("LeakyRelu") == 8  # linear head conv has no activation
    # every node input resolves to an initializer, graph input, or prior output
    known = set(parsed["inits"]) | set(parsed["inputs"])
    for n in parsed["nodes"]:
        assert all(i in known for i in n["inputs"]), n
        known.update(n["outputs"])


def _tiny():
    from yolojax.models.darknet import Tiny
    return Tiny


def _darknet():
    from yolojax.models.darknet import Darknet
    return Darknet


def test_onnx_tiny_matches_jax():
    _, got, want = _export_and_run(_tiny(), 64)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("order", ["darknet", "s2d"])
def test_onnx_darknet_matches_jax(order):
    # 64 → 2×2 grid; exercises passthrough reorg (both variants) + concat
    _, got, want = _export_and_run(_darknet(), 64, reorg_order=order)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_onnx_mobilenet_matches_jax():
    from yolojax.models.mobilenet import MobileNet

    _, got, want = _export_and_run(lambda **kw: MobileNet(**kw), 64)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def _deterministic_blob(size=32):
    """Export a narrow Tiny with params filled by a fixed numpy pattern (no
    PRNG provenance, CPU-only float ops) so the emitted bytes are a pure
    function of the exporter; widths pruned to 8 channels keep the fixture
    blob small."""
    import jax
    import jax.numpy as jnp

    from yolojax.models import ChannelResolver
    from yolojax.tools.onnx_export import export_onnx

    anchors = np.asarray([[1.2, 0.9], [3.1, 2.4]], np.float32)
    width = ChannelResolver({f"c{i}": 8 for i in range(1, 9)})
    model = _tiny()(anchors=anchors, num_classes=3, dtype=jnp.float32,
                    width=width)
    params, state = model.init(jax.random.PRNGKey(0))

    counter = [0]

    def fill(leaf):
        counter[0] += 1
        n = int(np.prod(leaf.shape)) if leaf.shape else 1
        vals = (np.arange(n, dtype=np.float64) * 0.001 + 0.01 * counter[0])
        return np.asarray(np.sin(vals) * 0.1 + 0.05, np.float32).reshape(leaf.shape)

    params = jax.tree_util.tree_map(fill, jax.device_get(params))
    state = jax.tree_util.tree_map(fill, jax.device_get(state))
    folded = jax.device_get(model.fold(params, state))
    return export_onnx(model, folded, anchors, size, batch=1)


def test_onnx_golden_bytes_fixture():
    """Emitted bytes are stable (VERDICT r2 #8): any change to the wire
    encoding shows up as a hash change here.  If the exporter changes
    INTENTIONALLY, regenerate with scripts/onnx_fixture.py and commit both."""
    import hashlib
    import json
    import os

    blob = _deterministic_blob()
    fixture_path = os.path.join(os.path.dirname(__file__), "fixtures",
                                "onnx_tiny_golden.json")
    with open(fixture_path) as f:
        fixture = json.load(f)
    assert len(blob) == fixture["length"]
    assert hashlib.sha256(blob).hexdigest() == fixture["sha256"]


def test_onnx_structural_checker_accepts_and_rejects():
    from yolojax.tools.onnx_export import check_model

    blob = _deterministic_blob()
    info = check_model(blob)
    assert info["ir_version"] == 6 and info["opset"] == 11
    assert info["inputs"] == ["images"] and info["outputs"] == ["detections"]
    assert info["nodes"] > 10 and info["initializers"] > 10

    # corrupt an initializer's raw_data length → must be rejected
    with pytest.raises(ValueError):
        check_model(blob[:-50])
    # an empty model is rejected for missing required fields
    with pytest.raises(ValueError, match="ModelProto missing"):
        check_model(b"")
    # EVERY truncation point raises ValueError, never IndexError (mid-varint,
    # mid-fixed, mid-LEN — the contract is "ValueError on the first violation")
    for cut in range(1, min(len(blob), 64)):
        with pytest.raises(ValueError):
            check_model(blob[:-cut])


def test_onnx_checker_opset_domain_handling():
    """The reported opset must come from the default-domain opset_import
    entry, and any entry without a version is rejected."""
    from yolojax.tools.onnx_export import (_f_bytes, _f_str, _f_varint,
                                           check_model)

    blob = _deterministic_blob()
    # locate + strip the trailing opset_import field this emitter writes last
    base = blob[:blob.rindex(b"\x42")]  # field 8, wire 2 key byte
    custom = _f_str(1, "com.custom") + _f_varint(2, 99)
    default = _f_str(1, "") + _f_varint(2, 11)
    # custom-domain entry FIRST: the checker must still report the default's 11
    info = check_model(base + _f_bytes(8, custom) + _f_bytes(8, default))
    assert info["opset"] == 11
    # a version-less custom entry is rejected even when the default is fine
    with pytest.raises(ValueError, match="missing version"):
        check_model(base + _f_bytes(8, _f_str(1, "com.custom"))
                    + _f_bytes(8, default))
    # no default-domain entry at all is rejected
    with pytest.raises(ValueError, match="default-domain"):
        check_model(base + _f_bytes(8, custom))


def test_onnx_real_package_validation():
    """Lights up automatically in environments that have onnx/onnxruntime
    (VERDICT r2 #8: the artifact has never met a real ONNX implementation)."""
    onnx = pytest.importorskip("onnx")

    blob = _deterministic_blob()
    model = onnx.load_from_string(blob)
    onnx.checker.check_model(model, full_check=True)
    try:
        import onnxruntime as ort
    except ImportError:
        return
    sess = ort.InferenceSession(blob, providers=["CPUExecutionProvider"])
    x = np.random.default_rng(0).uniform(0, 1, (1, 3, 32, 32)).astype(np.float32)
    (out,) = sess.run(None, {"images": x})
    assert out.shape[0] == 1 and np.isfinite(out).all()


def test_onnx_cli(workspace, tmp_path):
    """`export --format onnx` writes a parseable model (uses e2e workspace)."""
    from yolojax.cli.export import main

    root, cfg = workspace
    out = tmp_path / "model.onnx"
    assert main(cfg + ["--format", "onnx", "--size", "64",
                       "-o", str(out)]) == 0
    parsed = parse_model(out.read_bytes())
    assert parsed["outputs"] == ["detections"]


from test_cli_end_to_end import workspace  # noqa: E402,F401
