"""Cross-framework parity: our JAX models vs an independent torch build.

The reference is a torch implementation; matching torch's conv / BatchNorm /
LeakyReLU / MaxPool / reorg semantics numerically on shared weights is the
model-layer parity proof available without the reference mounted
(SURVEY.md provenance notice).  The torch model is constructed *from the
same plan tables*, with NHWC↔NCHW / HWIO↔OIHW conversions, and the darknet
reorg implemented through torch view/permute — an independent derivation of
the channel ordering (SURVEY.md §2.6's classic porting bug).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from yolojax.models.darknet import Darknet, Tiny
from yolojax.models.mobilenet import MobileNet

ANCHORS = np.asarray([[1.0, 1.0], [2.5, 2.5]], np.float32)


def torch_reorg(x, s=2):
    """Clean s2d reorg in torch (NCHW), derived independently from the
    offset-major contract: out[b, (p*s+q)*C + c] = in[b, c, h*s+p, w*s+q]."""
    b, c, h, w = x.shape
    x = x.view(b, c, h // s, s, w // s, s)          # (b, c, hi, p, wi, q)
    x = x.permute(0, 3, 5, 1, 2, 4).contiguous()    # (b, p, q, c, hi, wi)
    return x.view(b, s * s * c, h // s, w // s)


def torch_reorg_darknet(x, s=2):
    """Darknet's true reorg_cpu semantics in torch: reinterpret the (C,H,W)
    buffer as (C/s², H·s, W·s), offset-major s2d it back to (C,H,W), then
    reinterpret as (C·s², H/s, W/s).  Pinned to the literal C-loop oracle in
    test_reorg_oracle.py (through ops.reorg.reorg_darknet)."""
    b, c, h, w = x.shape
    oc = c // (s * s)
    t = x.contiguous().view(b, oc, h, s, w, s)      # (b, c2, j, p, i, q)
    t = t.permute(0, 3, 5, 1, 2, 4).contiguous()    # (b, p, q, c2, j, i)
    return t.view(b, c * s * s, h // s, w // s)


def run_torch_plan(model, params, state, x_nchw):
    """Execute the plan in torch eval mode with our weights."""
    import torch.nn.functional as F

    slots = {}
    x = x_nchw
    for op in model.plan:
        kind = op[0]
        if kind == "conv":
            d = op[1]
            p = params[d.name]
            w = torch.from_numpy(np.asarray(p["w"], np.float32).transpose(3, 2, 0, 1).copy())
            pad = d.ksize // 2
            x = F.conv2d(x, w, stride=d.stride, padding=pad, groups=d.groups)
            if "gamma" in p:
                s = state[d.name]
                x = F.batch_norm(
                    x, torch.from_numpy(np.asarray(s["mean"])),
                    torch.from_numpy(np.asarray(s["var"])),
                    torch.from_numpy(np.asarray(p["gamma"])),
                    torch.from_numpy(np.asarray(p["beta"])),
                    training=False, eps=model.bn.eps)
            else:
                x = x + torch.from_numpy(np.asarray(p["b"]))[None, :, None, None]
            if d.act:
                x = F.leaky_relu(x, 0.1)
        elif kind == "pool":
            size, stride = op[1], op[2]
            if stride == 1:  # darknet SAME-padded stride-1 tail pool
                x = F.pad(x, (0, 1, 0, 1), value=float("-inf"))
            x = F.max_pool2d(x, size, stride)
        elif kind == "mark":
            slots[op[1]] = x
        elif kind == "load":
            x = slots[op[1]]
        elif kind == "reorg":
            fn = torch_reorg_darknet if model.reorg_order == "darknet" else torch_reorg
            x = fn(x, op[1])
        elif kind == "concat":
            x = torch.cat([x, slots[op[1]]], dim=1)
    return x


@pytest.mark.parametrize("cls", [Darknet, Tiny, MobileNet])
def test_forward_matches_torch(cls, rng):
    model = cls(anchors=ANCHORS, num_classes=3, dtype=jnp.float32)
    params, state = model.init(jax.random.PRNGKey(0))
    # non-trivial BN stats so normalization is exercised
    for name in state:
        state[name]["mean"] = jnp.asarray(
            rng.normal(0, 0.2, state[name]["mean"].shape), jnp.float32)
        state[name]["var"] = jnp.asarray(
            rng.uniform(0.5, 1.5, state[name]["var"].shape), jnp.float32)
    x = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)

    ours, _ = model.apply(params, state, jnp.asarray(x), train=False)
    with torch.no_grad():
        theirs = run_torch_plan(model, params, state,
                                torch.from_numpy(x.transpose(0, 3, 1, 2).copy()))
    theirs = theirs.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("order,torch_fn,ch", [
    ("s2d", torch_reorg, 6),
    ("darknet", torch_reorg_darknet, 8),
])
def test_reorg_matches_torch_formulation(rng, order, torch_fn, ch):
    from yolojax.ops.reorg import reorg

    x = rng.standard_normal((2, 8, 8, ch)).astype(np.float32)
    ours = np.asarray(reorg(x, 2, order))
    with torch.no_grad():
        theirs = torch_fn(torch.from_numpy(x.transpose(0, 3, 1, 2).copy()), 2)
    theirs = theirs.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_array_equal(ours, theirs)
