"""Fused conv + BatchNorm + LeakyReLU blocks, TPU-first (SURVEY.md §2.6).

The reference builds every backbone from Conv → BatchNorm → LeakyReLU(0.1)
with bias-free convs when BN is on (darknet convention; reference
``model/yolo2.py`` conv blocks (recon)).  Here the block is a pair of pure
functions over pytrees:

* ``conv_init``  — parameter/state construction (He init, BN γ=1 β=0);
* ``conv_apply`` — NHWC conv via ``lax.conv_general_dilated`` in a configurable
  compute dtype (bfloat16 on TPU so the MXU runs at full rate, f32 accumulate
  via ``preferred_element_type``), with train-mode batch statistics returned
  functionally instead of mutated in place.

For inference, ``fold_bn`` folds the BN affine into the conv weights once so
the eval/detect/bench path is a single conv+bias+LeakyReLU per block — XLA
fuses the bias and activation into the convolution epilogue; there is no
BatchNorm at all on the hot path.

Parameters are stored float32 (master copy); casting to the compute dtype
happens inside apply so optimizers and checkpoints stay full precision.

Layout conventions: activations NHWC, weights HWIO — the TPU-native conv
layouts, as opposed to the reference's NCHW/OIHW torch layouts.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

__all__ = ["conv_init", "conv_apply", "fold_bn", "leaky_relu", "max_pool", "BNConfig"]

Params = dict[str, Any]


def leaky_relu(x, slope=0.1):
    """Darknet's leaky activation."""
    return jnp.where(x >= 0, x, slope * x)


class BNConfig:
    """Batch-norm hyperparameters from the ``[batch_norm]`` section.

    ``gamma``/``beta`` mirror the reference's per-affine-parameter toggles
    (SURVEY.md §2.1 ``[batch_norm]`` enable/gamma/beta): when off, the
    normalization uses a fixed scale 1 / shift 0 instead of the learnable
    parameter (the params stay in the pytree for checkpoint-shape stability;
    unused leaves receive zero gradients).
    """

    __slots__ = ("enable", "eps", "momentum", "gamma", "beta")

    def __init__(self, enable: bool = True, eps: float = 1e-5, momentum: float = 0.01,
                 gamma: bool = True, beta: bool = True):
        self.enable = enable
        self.eps = eps
        self.momentum = momentum
        self.gamma = gamma
        self.beta = beta

    @classmethod
    def from_config(cls, config):
        if config is None or not config.has_section("batch_norm"):
            return cls()
        return cls(
            enable=config.getboolean("batch_norm", "enable", fallback=True),
            eps=config.getfloat("batch_norm", "eps", fallback=1e-5),
            momentum=config.getfloat("batch_norm", "momentum", fallback=0.01),
            gamma=config.getboolean("batch_norm", "gamma", fallback=True),
            beta=config.getboolean("batch_norm", "beta", fallback=True),
        )


def conv_init(key, in_ch: int, out_ch: int, ksize: int, use_bn: bool = True,
              groups: int = 1):
    """Init one conv(+BN) block → (params, state) dicts.

    params: ``w`` (k, k, in/groups, out) f32 [+ ``b`` when no BN,
    + ``gamma``/``beta`` when BN].  state: BN running ``mean``/``var``.

    NAMING CONTRACT: these literal keys are matched by name elsewhere —
    ``'w'`` selects conv kernels for weight decay and ``'gamma'`` selects BN
    scales for the slimming L1 (utils/train.py ``_leaf_is``); renaming either
    (or introducing a non-BN param called ``gamma``) changes optimizer
    behavior silently.
    """
    fan_in = ksize * ksize * in_ch // groups
    w = jax.random.normal(key, (ksize, ksize, in_ch // groups, out_ch), jnp.float32)
    w = w * jnp.sqrt(2.0 / fan_in)
    params: Params = {"w": w}
    state: Params = {}
    if use_bn:
        params["gamma"] = jnp.ones((out_ch,), jnp.float32)
        params["beta"] = jnp.zeros((out_ch,), jnp.float32)
        state["mean"] = jnp.zeros((out_ch,), jnp.float32)
        state["var"] = jnp.ones((out_ch,), jnp.float32)
    else:
        params["b"] = jnp.zeros((out_ch,), jnp.float32)
    return params, state


def _conv(x, w, stride: int, groups: int, compute_dtype):
    # both operands in the compute dtype: mixed-dtype convs have no autodiff
    # transpose rule.  The TPU MXU accumulates bf16 products in f32
    # internally; downstream BN math promotes back to f32 via its f32 params.
    # Padding is darknet/torch-style symmetric k//2 (lax "SAME" pads
    # asymmetrically under stride 2, shifting outputs by one pixel vs the
    # reference semantics — matters for MobileNet's strided convs).
    pad = w.shape[0] // 2
    return jax.lax.conv_general_dilated(
        x.astype(compute_dtype), w.astype(compute_dtype),
        window_strides=(stride, stride), padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )


def conv_apply(params: Params, state: Params, x, *, stride: int = 1, groups: int = 1,
               act: bool = True, bn: BNConfig | None = None, train: bool = False,
               compute_dtype=jnp.bfloat16):
    """Apply conv → BN → LeakyReLU. Returns (y, new_state).

    Train mode normalizes by batch statistics and returns EMA-updated running
    stats; eval mode uses running stats (prefer ``fold_bn`` + this with
    BN-free params for the hot inference path).
    """
    bn = bn or BNConfig()
    y = _conv(x, params["w"], stride, groups, compute_dtype)
    new_state = state
    if "gamma" in params and bn.enable:
        if train:
            mean = jnp.mean(y, axis=(0, 1, 2))
            var = jnp.var(y, axis=(0, 1, 2))
            m = bn.momentum
            new_state = {
                "mean": (1 - m) * state["mean"] + m * mean,
                "var": (1 - m) * state["var"] + m * var,
            }
        else:
            mean, var = state["mean"], state["var"]
        inv = jax.lax.rsqrt(var + bn.eps)
        if bn.gamma:
            inv = inv * params["gamma"]
        y = (y - mean) * inv + (params["beta"] if bn.beta else 0.0)
    elif "b" in params:
        y = y + params["b"]
    if act:
        y = leaky_relu(y)
    return y.astype(compute_dtype), new_state


def fold_bn(params: Params, state: Params, bn: BNConfig | None = None) -> Params:
    """Fold BN affine+stats into the conv → inference-only {w, b} params.

    w'[..., o] = w[..., o] * γ_o / √(σ²_o + ε);  b' = β − γ·μ/√(σ²+ε).
    After folding, the block is conv+bias+activation — one fused XLA op.
    Honors the ``[batch_norm]`` gamma/beta toggles (γ→1, β→0 when disabled).
    """
    bn = bn or BNConfig()
    if "gamma" not in params or not bn.enable:
        out = {k: v for k, v in params.items() if k in ("w", "b")}
        out.setdefault("b", jnp.zeros((params["w"].shape[-1],), jnp.float32))
        return out
    gamma = params["gamma"] if bn.gamma else 1.0
    beta = params["beta"] if bn.beta else 0.0
    scale = gamma / jnp.sqrt(state["var"] + bn.eps)  # (out_ch,) — var is per-channel
    return {
        "w": params["w"] * scale[None, None, None, :],
        "b": beta - state["mean"] * scale,
    }


def _rw_max2x2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


@jax.custom_vjp
def _max_pool2x2(x):
    """2×2/2 max pool with a mask-based backward — MEASURED NEGATIVE, not
    routed (see max_pool below).

    XLA's reduce_window gradient lowers to SelectAndScatter (pool1-bwd
    12.5 ms vs ~4 ms traffic bound at B=128 — scripts/bwd_profile.py), so a
    first-max mask backward looked promising; in-graph it is far WORSE
    (train step 152.7 → 212.2 ms: TPU stride-2 slicing + stack/reshape
    interleave relayouts dominate).  Kept with its bit-parity tests
    (tests/test_pool_vjp.py) as the documented negative and tie-semantics
    oracle; see scripts/pool_bwd_variants.py for the formulation sweep.
    """
    return _rw_max2x2(x)


def _max_pool2x2_fwd(x):
    y = _rw_max2x2(x)
    return y, (x, y)


def _max_pool2x2_bwd(res, g):
    """Mask-based pool backward oracle.  Requires even H/W (the quadrant
    slices below assume it); NaN inputs diverge from SelectAndScatter (all
    eq-masks are false, so the gradient routes to the last quadrant)."""
    x, y = res
    b, h, w, c = x.shape
    assert h % 2 == 0 and w % 2 == 0, (
        f"_max_pool2x2 backward requires even spatial dims, got {h}x{w}")
    q00 = x[:, 0::2, 0::2, :]
    q01 = x[:, 0::2, 1::2, :]
    q10 = x[:, 1::2, 0::2, :]
    q11 = x[:, 1::2, 1::2, :]
    m00 = q00 == y
    m01 = (q01 == y) & ~m00
    m10 = (q10 == y) & ~m00 & ~m01
    m11 = ~m00 & ~m01 & ~m10
    zero = jnp.zeros((), g.dtype)
    d00 = jnp.where(m00, g, zero)
    d01 = jnp.where(m01, g, zero)
    d10 = jnp.where(m10, g, zero)
    d11 = jnp.where(m11, g, zero)
    # interleave quadrants back: stack along a new minor axis then reshape
    row0 = jnp.stack([d00, d01], axis=3).reshape(b, h // 2, w, c)
    row1 = jnp.stack([d10, d11], axis=3).reshape(b, h // 2, w, c)
    return (jnp.stack([row0, row1], axis=2).reshape(b, h, w, c),)


_max_pool2x2.defvjp(_max_pool2x2_fwd, _max_pool2x2_bwd)


def max_pool(x, size: int = 2, stride: int | None = None):
    """Max pooling with darknet semantics (SAME padding for the stride-1 tail
    pool in Tiny-Darknet, VALID otherwise)."""
    stride = size if stride is None else stride
    padding = "SAME" if stride == 1 else "VALID"
    # init must be the true -inf identity: reverse-mode autodiff of
    # reduce_window(max) requires a monoid with identity (finfo.min breaks it)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, size, size, 1), (1, stride, stride, 1), padding)
