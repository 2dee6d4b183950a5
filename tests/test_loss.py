"""Region loss golden tests (SURVEY.md §2.10 — the hardest parity component).

A naive sequential numpy implementation of the darknet region-loss semantics
serves as the oracle; the vectorized/vmapped TPU implementation must match it
on random inputs, collisions included.
"""

import numpy as np
import pytest

from yolojax.ops.loss import LossConfig, region_loss


def sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def softmax(x):
    e = np.exp(x - x.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


def np_iou(b1_min, b1_max, b2_min, b2_max):
    mn = np.maximum(b1_min, b2_min)
    mx = np.minimum(b1_max, b2_max)
    hw = np.maximum(mx - mn, 0.0)
    inter = hw[0] * hw[1]
    a1 = np.prod(np.maximum(b1_max - b1_min, 0))
    a2 = np.prod(np.maximum(b2_max - b2_min, 0))
    return inter / max(a1 + a2 - inter, 1e-10)


def oracle_loss(raw, anchors, gt_min, gt_max, gt_cls, gt_valid, seen, cfg: LossConfig):
    """Sequential darknet-style region loss for ONE image."""
    h, w, ch = raw.shape
    a = anchors.shape[0]
    per = ch // a
    c = per - 5
    x = raw.reshape(h, w, a, per)
    sig_yx = sigmoid(x[..., :2])
    t_hw = x[..., 2:4]
    sig_o = sigmoid(x[..., 4])
    prob = softmax(x[..., 5:])

    # decoded boxes per (y, x, anchor), normalized
    pred_min = np.zeros((h, w, a, 2))
    pred_max = np.zeros((h, w, a, 2))
    for yi in range(h):
        for xi in range(w):
            for ai in range(a):
                center = (sig_yx[yi, xi, ai] + [yi, xi]) / [h, w]
                size = anchors[ai] * np.exp(t_hw[yi, xi, ai]) / [h, w]
                pred_min[yi, xi, ai] = center - size / 2
                pred_max[yi, xi, ai] = center + size / 2

    # sequential assignment, later gt overwrites
    assign = {}
    for gi in range(len(gt_cls)):
        if not gt_valid[gi]:
            continue
        center = (gt_min[gi] + gt_max[gi]) / 2 * [h, w]
        hw_g = (gt_max[gi] - gt_min[gi]) * [h, w]
        cy, cx = np.clip(np.floor(center).astype(int), 0, [h - 1, w - 1])
        best, best_iou = 0, -1
        for ai in range(a):
            mn = np.minimum(hw_g, anchors[ai])
            inter = mn[0] * mn[1]
            union = hw_g[0] * hw_g[1] + anchors[ai][0] * anchors[ai][1] - inter
            v = inter / max(union, 1e-10)
            if v > best_iou:
                best, best_iou = ai, v
        assign[(cy, cx, best)] = gi

    coord = obj = cls_loss = noobj = prior = 0.0
    for yi in range(h):
        for xi in range(w):
            for ai in range(a):
                key = (yi, xi, ai)
                if key in assign:
                    gi = assign[key]
                    center = (gt_min[gi] + gt_max[gi]) / 2 * [h, w]
                    hw_g = (gt_max[gi] - gt_min[gi]) * [h, w]
                    tyx_t = center - np.floor(center).clip(0, [h - 1, w - 1])
                    thw_t = np.log(np.maximum(hw_g, 1e-8) / anchors[ai])
                    boost = 2 - np.prod(gt_max[gi] - gt_min[gi]) if cfg.coord_boost else 1.0
                    coord += boost * (np.sum((sig_yx[yi, xi, ai] - tyx_t) ** 2)
                                      + np.sum((t_hw[yi, xi, ai] - thw_t) ** 2))
                    iou_t = np_iou(pred_min[yi, xi, ai], pred_max[yi, xi, ai],
                                   gt_min[gi], gt_max[gi])
                    target = iou_t if cfg.rescore else 1.0
                    obj += (sig_o[yi, xi, ai] - target) ** 2
                    one = np.zeros(c)
                    one[gt_cls[gi]] = 1
                    cls_loss += np.sum((prob[yi, xi, ai] - one) ** 2)
                else:
                    best_iou = 0.0
                    for gi in range(len(gt_cls)):
                        if gt_valid[gi]:
                            best_iou = max(best_iou, np_iou(
                                pred_min[yi, xi, ai], pred_max[yi, xi, ai],
                                gt_min[gi], gt_max[gi]))
                    if best_iou < cfg.ignore_threshold:
                        noobj += sig_o[yi, xi, ai] ** 2
                    if seen < cfg.warmup_seen:
                        prior += (np.sum((sig_yx[yi, xi, ai] - 0.5) ** 2)
                                  + np.sum(t_hw[yi, xi, ai] ** 2))
    return dict(coord=coord, object=obj, noobject=noobj, cls=cls_loss, prior=prior)


def make_case(rng, b=2, h=3, w=4, a=2, c=3, g=5):
    anchors = rng.uniform(0.5, 3.0, (a, 2)).astype(np.float32)
    raw = rng.standard_normal((b, h, w, a * (5 + c))).astype(np.float32)
    center = rng.uniform(0.1, 0.9, (b, g, 2)).astype(np.float32)
    half = rng.uniform(0.02, 0.3, (b, g, 2)).astype(np.float32)
    gt_min = np.clip(center - half, 0, 1)
    gt_max = np.clip(center + half, 0, 1)
    gt_cls = rng.integers(0, c, (b, g)).astype(np.int32)
    gt_valid = rng.uniform(0, 1, (b, g)) > 0.3
    return raw, anchors, gt_min, gt_max, gt_cls, gt_valid


@pytest.mark.parametrize("rescore,boost,seen", [(True, True, 0), (False, False, 99999)])
def test_loss_matches_sequential_oracle(rng, rescore, boost, seen):
    cfg = LossConfig(rescore=rescore, coord_boost=boost)
    raw, anchors, gt_min, gt_max, gt_cls, gt_valid = make_case(rng)
    got = {k: float(v) for k, v in region_loss(
        raw, anchors, gt_min, gt_max, gt_cls, gt_valid, seen, cfg).items()}
    want = {}
    for bi in range(raw.shape[0]):
        o = oracle_loss(raw[bi], anchors, gt_min[bi], gt_max[bi],
                        gt_cls[bi], gt_valid[bi], seen, cfg)
        for k, v in o.items():
            want[k] = want.get(k, 0.0) + v / raw.shape[0]
    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=2e-4, err_msg=k)


def assert_matches_oracle(raw, anchors, gt_min, gt_max, gt_cls, gt_valid, seen, cfg,
                          rtol=2e-4):
    got = {k: float(v) for k, v in region_loss(
        raw, anchors, gt_min, gt_max, gt_cls, gt_valid, seen, cfg).items()}
    want = {}
    for bi in range(raw.shape[0]):
        o = oracle_loss(raw[bi], anchors, gt_min[bi], gt_max[bi],
                        gt_cls[bi], gt_valid[bi], seen, cfg)
        for k, v in o.items():
            want[k] = want.get(k, 0.0) + v / raw.shape[0]
    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=rtol, atol=1e-7, err_msg=k)


def test_loss_oracle_cell_boundary_centers(rng):
    """gt centers landing exactly on cell boundaries (floor ties) and at the
    far image edge (clip to the last cell)."""
    h, w, a, c = 3, 4, 2, 3
    anchors = rng.uniform(0.5, 3.0, (a, 2)).astype(np.float32)
    raw = rng.standard_normal((1, h, w, a * (5 + c))).astype(np.float32)
    # centers: exactly on the (1/h, 2/w) cell corner; exactly at 1.0 (edge)
    centers = np.asarray([[1 / 3, 2 / 4], [1.0, 1.0], [0.0, 0.0]], np.float32)
    half = np.asarray([[0.1, 0.1], [0.05, 0.08], [0.06, 0.04]], np.float32)
    gt_min = (centers - half)[None]
    gt_max = (centers + half)[None]
    gt_cls = np.asarray([[0, 1, 2]], np.int32)
    gt_valid = np.ones((1, 3), bool)
    assert_matches_oracle(raw, anchors, gt_min, gt_max, gt_cls, gt_valid,
                          0, LossConfig())


def test_loss_oracle_oversize_and_degenerate_gt(rng):
    """gt spanning the whole image after clip, plus a zero-area gt."""
    h, w, a, c = 3, 4, 2, 3
    anchors = rng.uniform(0.5, 3.0, (a, 2)).astype(np.float32)
    raw = rng.standard_normal((1, h, w, a * (5 + c))).astype(np.float32)
    gt_min = np.asarray([[[0.0, 0.0], [0.4, 0.6]]], np.float32)
    gt_max = np.asarray([[[1.0, 1.0], [0.4, 0.6]]], np.float32)  # full image; point
    gt_cls = np.asarray([[1, 0]], np.int32)
    gt_valid = np.ones((1, 2), bool)
    assert_matches_oracle(raw, anchors, gt_min, gt_max, gt_cls, gt_valid,
                          10**9, LossConfig())


def test_loss_oracle_all_invalid_batch(rng):
    """No valid gts: only noobject (all anchors) and warmup prior remain."""
    raw, anchors, gt_min, gt_max, gt_cls, _ = make_case(rng, b=2)
    gt_valid = np.zeros(gt_cls.shape, bool)
    cfg = LossConfig()
    assert_matches_oracle(raw, anchors, gt_min, gt_max, gt_cls, gt_valid, 0, cfg)
    got = region_loss(raw, anchors, gt_min, gt_max, gt_cls, gt_valid, 0, cfg)
    assert float(got["coord"]) == 0 and float(got["cls"]) == 0
    n = raw.shape[1] * raw.shape[2] * anchors.shape[0]
    x = raw.reshape(raw.shape[0], n, -1)
    sig_o = 1 / (1 + np.exp(-x[..., 4]))
    np.testing.assert_allclose(float(got["noobject"]),
                               (sig_o ** 2).sum(1).mean(), rtol=1e-5)


def test_loss_oracle_single_class(rng):
    """C=1: softmax over one logit is constant 1 — cls loss still defined."""
    raw, anchors, gt_min, gt_max, gt_cls, gt_valid = make_case(rng, c=1)
    assert_matches_oracle(raw, anchors, gt_min, gt_max, gt_cls, gt_valid,
                          0, LossConfig())


def test_loss_oracle_real_geometry(rng):
    """The actual 13×13×5-anchor×20-class geometry (slow oracle, one case)."""
    anchors = np.asarray([[1.73, 1.32], [4.0, 3.19], [8.1, 5.06],
                          [4.84, 9.47], [10.0, 11.2]], np.float32)
    raw = rng.standard_normal((1, 13, 13, 5 * 25)).astype(np.float32)
    center = rng.uniform(0.05, 0.95, (1, 8, 2)).astype(np.float32)
    half = rng.uniform(0.02, 0.4, (1, 8, 2)).astype(np.float32)
    gt_min = np.clip(center - half, 0, 1)
    gt_max = np.clip(center + half, 0, 1)
    gt_cls = rng.integers(0, 20, (1, 8)).astype(np.int32)
    gt_valid = rng.uniform(0, 1, (1, 8)) > 0.2
    assert_matches_oracle(raw, anchors, gt_min, gt_max, gt_cls, gt_valid,
                          0, LossConfig(), rtol=5e-4)


def test_loss_collision_last_wins(rng):
    # two gts forced into the same cell+anchor → only the later one counts
    cfg = LossConfig()
    anchors = np.asarray([[1.0, 1.0]], dtype=np.float32)
    raw = rng.standard_normal((1, 2, 2, 8)).astype(np.float32)
    gt_min = np.asarray([[[0.1, 0.1], [0.05, 0.05]]], dtype=np.float32)
    gt_max = np.asarray([[[0.4, 0.4], [0.45, 0.45]]], dtype=np.float32)
    gt_cls = np.asarray([[0, 1]], dtype=np.int32)
    valid = np.ones((1, 2), dtype=bool)
    both = region_loss(raw, anchors, gt_min, gt_max, gt_cls, valid, 1 << 30, cfg)
    only_second = region_loss(raw, anchors, gt_min[:, 1:], gt_max[:, 1:],
                              gt_cls[:, 1:], valid[:, 1:], 1 << 30, cfg)
    for k in ("coord", "object", "cls"):
        np.testing.assert_allclose(float(both[k]), float(only_second[k]), rtol=1e-5, err_msg=k)


def test_loss_is_differentiable(rng):
    import jax
    raw, anchors, gt_min, gt_max, gt_cls, gt_valid = make_case(rng, b=1)

    def total(r):
        d = region_loss(r, anchors, gt_min, gt_max, gt_cls, gt_valid, 0, LossConfig())
        return sum(d.values())

    g = jax.grad(total)(raw)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_warmup_term_gates_on_seen(rng):
    raw, anchors, gt_min, gt_max, gt_cls, gt_valid = make_case(rng, b=1)
    cfg = LossConfig()
    early = region_loss(raw, anchors, gt_min, gt_max, gt_cls, gt_valid, 0, cfg)
    late = region_loss(raw, anchors, gt_min, gt_max, gt_cls, gt_valid, cfg.warmup_seen, cfg)
    assert float(early["prior"]) > 0
    assert float(late["prior"]) == 0


def test_class_grad_darknet_value_matches_mse(rng):
    """The reported cls VALUE is the squared error under both gradient modes."""
    raw, anchors, gt_min, gt_max, gt_cls, gt_valid = make_case(rng, c=80, g=4)
    a = region_loss(raw, anchors, gt_min, gt_max, gt_cls, gt_valid, 1 << 30,
                    LossConfig(class_grad="darknet"))
    b = region_loss(raw, anchors, gt_min, gt_max, gt_cls, gt_valid, 1 << 30,
                    LossConfig(class_grad="mse"))
    for k in a:
        np.testing.assert_allclose(float(a[k]), float(b[k]), rtol=1e-5, err_msg=k)


def test_class_grad_darknet_is_delta_on_logits(rng):
    """d cls / d class-logits == pos * (softmax(prob) - onehot) exactly —
    darknet region_layer's delta, no softmax Jacobian."""
    import jax
    import jax.numpy as jnp

    raw, anchors, gt_min, gt_max, gt_cls, gt_valid = make_case(rng, b=1, c=7, g=3)
    cfg = LossConfig(class_grad="darknet")

    def cls_of(r):
        return region_loss(r, anchors, gt_min, gt_max, gt_cls, gt_valid, 1 << 30, cfg)["cls"]

    g = np.asarray(jax.grad(cls_of)(raw))[0]
    b, h, w, ch = raw.shape
    a = anchors.shape[0]
    per = ch // a
    c = per - 5
    x = raw[0].reshape(h, w, a, per).reshape(-1, per)
    prob = np.asarray(jax.nn.softmax(jnp.asarray(x[:, 5:]), axis=-1))
    # rebuild the positive mask + scattered one-hot target via the mse-mode
    # gradient's support (non-zero rows are exactly the positives)
    g_cls = g.reshape(h, w, a, per).reshape(-1, per)[:, 5:]
    for i in range(g_cls.shape[0]):
        row = g_cls[i]
        if np.abs(row).sum() == 0:
            continue  # negative anchor: no class gradient
        # positive: row must equal prob - onehot for SOME class
        diffs = [np.abs(row - (prob[i] - np.eye(c)[k])).max() for k in range(c)]
        assert min(diffs) < 1e-5
    # mean over batch=1 only; at least one positive must exist in this case
    assert np.abs(g_cls).sum() > 0


def test_class_grad_trainability_c80(rng):
    """The round-5 coco80 postmortem, frozen as a unit test: at C=80 the
    darknet class delta escapes the uniform-softmax plateau in a few dozen
    steps, while true MSE-through-softmax measurably stalls there (the
    gradient is ~2*p_true*(1-p_true)^2 ~ 1/C).  Optimizes the raw head
    activations directly — no network, CPU-fast."""
    import jax

    raw, anchors, gt_min, gt_max, gt_cls, gt_valid = make_case(rng, b=1, c=80, g=4)
    raw = np.zeros_like(raw)  # uniform softmax: the observed plateau
    gt_valid = np.ones_like(gt_valid)

    def train(mode, steps=300, lr=0.1):
        cfg = LossConfig(class_grad=mode)

        def f(r):
            return region_loss(r, anchors, gt_min, gt_max, gt_cls, gt_valid,
                               1 << 30, cfg)["cls"]

        grad = jax.jit(jax.grad(f))
        r = raw
        first = float(region_loss(r, anchors, gt_min, gt_max, gt_cls, gt_valid,
                                  1 << 30, cfg)["cls"])
        for _ in range(steps):
            r = r - lr * np.asarray(grad(r))
        last = float(region_loss(r, anchors, gt_min, gt_max, gt_cls, gt_valid,
                                 1 << 30, cfg)["cls"])
        return first, last

    f0, f_darknet = train("darknet")
    _, f_mse = train("mse")
    assert f_darknet < 0.25 * f0, (f0, f_darknet)
    assert f_mse > 0.80 * f0, (f0, f_mse)
