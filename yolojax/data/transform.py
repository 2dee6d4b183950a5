"""Fused on-device augmentation graph (SURVEY.md §2.5; BASELINE north_star:
"the image ingest path … becomes a fused JAX/XLA preprocessing graph").

The reference applies per-image Python transforms in DataLoader workers
(reference ``transform/`` package (recon)): darknet-style jitter crop, random
horizontal flip, HSV distortion, resize, normalize — with joint bbox
co-transforms.  Here the *whole* batch pipeline after JPEG decode is one
jitted XLA program per bucketed output size:

    gray canvas (B,C,C,3) u8 ──┐
    image sizes (B,2)          ├─► crop/resize (scale_and_translate) ─► flip
    boxes (B,G,2·2) + valid ───┘     └► HSV jitter ─► [0,1] f32  + boxes′

Semantics match darknet training (paper §Training, PAPERS.md:9): crop borders
jittered by ±jitter·(h,w) (pad regions fill gray), hue shifted uniformly in
±hue (wrapping), saturation/value scaled by s or 1/s with s ~ U(1, smax),
flip with p=0.5.  Boxes are clipped to the crop and degenerate rows are
invalidated.  Eval/detect use the deterministic letterbox path, whose
(scale, pad) output inverts detections back to original pixel space.

Host-side contract: images are pasted *centered* into a gray(127) canvas so
jittered crops that extend past the image sample gray, not garbage; sampled
pads are clamped to the canvas margin.

The config surface keeps the reference's dotted-path transform list
(``[transform] train``); the marker classes below carry the per-op params.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from ..config import parse_attr_list

__all__ = ["RandomCrop", "RandomFlipHorizontally", "HSVJitter", "TrainAugment",
           "letterbox", "letterbox_batch", "rgb_to_hsv", "hsv_to_rgb"]


# --------------------------------------------------------------------------
# color space
# --------------------------------------------------------------------------

def rgb_to_hsv(rgb):
    """(…, 3) float [0,1] RGB → HSV, all vectorized."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    mx = jnp.max(rgb, axis=-1)
    mn = jnp.min(rgb, axis=-1)
    d = mx - mn
    safe_d = jnp.where(d > 0, d, 1.0)
    h = jnp.where(mx == r, (g - b) / safe_d % 6.0,
                  jnp.where(mx == g, (b - r) / safe_d + 2.0, (r - g) / safe_d + 4.0))
    h = jnp.where(d > 0, h / 6.0, 0.0)
    s = jnp.where(mx > 0, d / jnp.where(mx > 0, mx, 1.0), 0.0)
    return jnp.stack([h, s, mx], axis=-1)


def hsv_to_rgb(hsv):
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1 - s)
    q = v * (1 - f * s)
    t = v * (1 - (1 - f) * s)
    i = i.astype(jnp.int32) % 6

    # sector table as nested selects — gathers (jnp.choose) cost ~60× more
    # than VPU selects on TPU (278 ms → 5 ms for a 32×416² augment batch)
    def sector(c0, c1, c2, c3, c4, c5):
        return jnp.where(i == 0, c0, jnp.where(i == 1, c1, jnp.where(
            i == 2, c2, jnp.where(i == 3, c3, jnp.where(i == 4, c4, c5)))))

    r = sector(v, q, p, p, t, v)
    g = sector(t, v, v, q, p, p)
    b = sector(p, p, t, v, v, q)
    return jnp.stack([r, g, b], axis=-1)


# --------------------------------------------------------------------------
# transform marker classes — the ini-visible names
# --------------------------------------------------------------------------

@dataclass
class RandomCrop:
    """Darknet border-jitter crop; pads sample the gray canvas."""

    jitter: float = 0.2


@dataclass
class RandomFlipHorizontally:
    prob: float = 0.5


@dataclass
class HSVJitter:
    hue: float = 0.1
    saturation: float = 1.5
    exposure: float = 1.5


def _rand_scale(key, smax):
    """darknet rand_scale: s ~ U(1, smax), inverted with p=0.5."""
    k1, k2 = jax.random.split(key)
    s = jax.random.uniform(k1, (), minval=1.0, maxval=smax)
    return jnp.where(jax.random.bernoulli(k2), s, 1.0 / s)


# --------------------------------------------------------------------------
# train-time augmentation
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class TrainAugment:
    """Config-resolved augmentation parameters; __call__ is the fused graph."""

    crop: bool = True
    flip: bool = True
    hsv: bool = True
    jitter: float = 0.2
    hue: float = 0.1
    saturation: float = 1.5
    exposure: float = 1.5
    flip_prob: float = 0.5
    # pixel compute dtype: the resize is two dense matmuls per axis and HSV
    # is ~6 elementwise passes — bf16 halves their HBM traffic and runs the
    # MXU at full rate, and the model casts inputs to bf16 at conv1 anyway.
    # Box geometry always stays f32.  (round-3 train-step optimization)
    dtype: Any = jnp.bfloat16
    # darknet's own resize (cv2-style bilinear) has NO antialias prefilter;
    # True widens the kernel support on downscale (costlier weight matrices).
    # Measured in scripts/augment_profile.py.
    antialias: bool = True

    @classmethod
    def from_config(cls, config):
        names = {type(t).__name__ if not isinstance(t, type) else t.__name__
                 for t in parse_attr_list(config.get("transform", "train", fallback=""))}
        # [transform] dtype = bfloat16 (default) | float32 — restores f32
        # pixel math from config alone, for parity with the antialias knob
        dtype = getattr(jnp, config.get("transform", "dtype", fallback="bfloat16"))
        return cls(
            crop="RandomCrop" in names,
            flip="RandomFlipHorizontally" in names,
            hsv="HSVJitter" in names,
            jitter=config.getfloat("transform", "jitter", fallback=0.2),
            hue=config.getfloat("transform", "hue", fallback=0.1),
            saturation=config.getfloat("transform", "saturation", fallback=1.5),
            exposure=config.getfloat("transform", "exposure", fallback=1.5),
            dtype=dtype,
            antialias=config.getboolean("transform", "antialias", fallback=True),
        )

    def _one(self, key, canvas, hw, yx_min, yx_max, valid, out_size: int):
        """Augment one image. canvas (C,C,3) u8, hw (2,), boxes normalized."""
        c = canvas.shape[0]
        s = float(out_size)
        k_crop, k_flip, k_hue, k_sat, k_val = jax.random.split(key, 5)
        h, w = hw[0], hw[1]
        origin = (jnp.asarray([c, c], jnp.float32) - hw) * 0.5  # centered paste

        # -- crop box in image-frame pixels (pt/pl may be negative = pad) --
        if self.crop:
            j = self.jitter
            pads = jax.random.uniform(k_crop, (4,), minval=-j, maxval=j)
            pads = pads * jnp.asarray([h, h, w, w])
            pads = jnp.maximum(pads, -origin[jnp.asarray([0, 0, 1, 1])])  # clamp to margin
            pt, pb, pl, pr = pads[0], pads[1], pads[2], pads[3]
        else:
            pt = pb = pl = pr = jnp.float32(0.0)
        crop_hw = jnp.stack([h - pt - pb, w - pl - pr])
        crop_origin = origin + jnp.stack([pt, pl])  # canvas coords

        # -- resize crop → (S, S): forward map i·scale + translation --
        scale = s / crop_hw
        translation = -crop_origin * scale
        img = jax.image.scale_and_translate(
            canvas.astype(self.dtype) * jnp.asarray(1 / 255.0, self.dtype),
            (out_size, out_size, 3), (0, 1),
            scale, translation, method="linear", antialias=self.antialias)

        # -- boxes: image-normalized → crop-normalized --
        img_px_min = yx_min * hw
        img_px_max = yx_max * hw
        off = jnp.stack([pt, pl])
        new_min = (img_px_min - off) / crop_hw
        new_max = (img_px_max - off) / crop_hw
        new_min = jnp.clip(new_min, 0.0, 1.0)
        new_max = jnp.clip(new_max, 0.0, 1.0)
        ext = new_max - new_min
        valid = valid & (ext[:, 0] > 1e-3) & (ext[:, 1] > 1e-3)

        # -- horizontal flip --
        if self.flip:
            do = jax.random.bernoulli(k_flip, self.flip_prob)
            img = jnp.where(do, img[:, ::-1, :], img)
            fmin = jnp.stack([new_min[:, 0], 1.0 - new_max[:, 1]], axis=1)
            fmax = jnp.stack([new_max[:, 0], 1.0 - new_min[:, 1]], axis=1)
            new_min = jnp.where(do, fmin, new_min)
            new_max = jnp.where(do, fmax, new_max)

        # -- HSV jitter --
        if self.hsv:
            dh = jax.random.uniform(k_hue, (), minval=-self.hue, maxval=self.hue)
            ds = _rand_scale(k_sat, self.saturation)
            dv = _rand_scale(k_val, self.exposure)
            # jitter scalars in the pixel dtype so the elementwise passes
            # don't silently promote the whole image back to f32
            dh, ds, dv = (v.astype(img.dtype) for v in (dh, ds, dv))
            hsv = rgb_to_hsv(jnp.clip(img, 0.0, 1.0))
            hsv = jnp.stack([(hsv[..., 0] + dh) % 1.0,
                             jnp.clip(hsv[..., 1] * ds, 0.0, 1.0),
                             jnp.clip(hsv[..., 2] * dv, 0.0, 1.0)], axis=-1)
            img = hsv_to_rgb(hsv)

        return img, new_min, new_max, valid

    @partial(jax.jit, static_argnames=("self", "out_size"))
    def __call__(self, key, canvas, hw, yx_min, yx_max, valid, out_size: int):
        """Batched fused augmentation. canvas (B,C,C,3) u8 → (B,S,S,3) pixels
        in ``self.dtype`` (bf16 by default; boxes/valid stay f32/bool)."""
        keys = jax.random.split(key, canvas.shape[0])
        return jax.vmap(self._one, in_axes=(0, 0, 0, 0, 0, 0, None))(
            keys, canvas, hw.astype(jnp.float32), yx_min, yx_max, valid, out_size)


# --------------------------------------------------------------------------
# deterministic eval/detect resize family (SURVEY.md §2.5 "Resize family":
# plain rescale and letterbox-style fit; selected by ``[transform] resize``).
# Both return per-image per-axis (scale (2,), pad (2,)); detections in
# output-normalized coords map back via ``orig_px = (coord*S - pad) / scale``.
# --------------------------------------------------------------------------

def _affine_resize(canvas, hw, out_size: int, scale, pad):
    c = canvas.shape[0]
    origin = (jnp.asarray([c, c], jnp.float32) - hw) * 0.5
    translation = pad - origin * scale
    return jax.image.scale_and_translate(
        canvas.astype(jnp.float32) / 255.0, (out_size, out_size, 3), (0, 1),
        scale, translation, method="linear", antialias=True)


def _letterbox_one(canvas, hw, out_size: int):
    s = float(out_size)
    scale = jnp.broadcast_to(jnp.min(s / hw), (2,))
    pad = (s - hw * scale) * 0.5
    return _affine_resize(canvas, hw, out_size, scale, pad), scale, pad


def _stretch_one(canvas, hw, out_size: int):
    # darknet's plain resize: per-axis stretch to the square network input —
    # the geometry the training pipeline produces (crop disabled ⇒ stretch),
    # and the one the paper's numbers use
    s = float(out_size)
    scale = s / hw
    pad = jnp.zeros((2,), jnp.float32)
    return _affine_resize(canvas, hw, out_size, scale, pad), scale, pad


@partial(jax.jit, static_argnames=("out_size",))
def letterbox_batch(canvas, hw, out_size: int):
    """Aspect-preserving fit with gray bands; (B,C,C,3) u8 → (B,S,S,3) f32."""
    return jax.vmap(_letterbox_one, in_axes=(0, 0, None))(
        canvas, hw.astype(jnp.float32), out_size)


@partial(jax.jit, static_argnames=("out_size",))
def stretch_batch(canvas, hw, out_size: int):
    """Per-axis stretch to S×S (darknet eval resize)."""
    return jax.vmap(_stretch_one, in_axes=(0, 0, None))(
        canvas, hw.astype(jnp.float32), out_size)


# ini-visible names for ``[transform] resize``
letterbox = letterbox_batch
stretch = stretch_batch


def resize_from_config(config):
    """Resolve the eval/detect resize fn (``[transform] resize`` dotted path)."""
    from ..config import parse_attr

    path = config.get("transform", "resize",
                      fallback="yolojax.data.transform.stretch")
    return parse_attr(path)
