"""Fused augmentation graph tests (SURVEY.md §2.5 contracts)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolojax.data.transform import (HSVJitter, RandomCrop, TrainAugment,
                                    hsv_to_rgb, letterbox_batch, rgb_to_hsv)


def canvas_with_image(c=64, h=40, w=48, value=None, rng=None):
    canvas = np.full((c, c, 3), 127, np.uint8)
    oy, ox = (c - h) // 2, (c - w) // 2
    img = value if value is not None else rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    canvas[oy:oy + h, ox:ox + w] = img
    return canvas, np.asarray([h, w], np.float32)


def test_hsv_roundtrip(rng):
    rgb = rng.uniform(0, 1, (16, 16, 3)).astype(np.float32)
    back = np.asarray(hsv_to_rgb(rgb_to_hsv(rgb)))
    np.testing.assert_allclose(back, rgb, atol=1e-5)


def test_hsv_known_values():
    # pure red → h=0, s=1, v=1; gray → s=0
    hsv = np.asarray(rgb_to_hsv(np.asarray([[1.0, 0, 0], [0.5, 0.5, 0.5]])))
    np.testing.assert_allclose(hsv[0], [0, 1, 1], atol=1e-6)
    np.testing.assert_allclose(hsv[1], [0, 0, 0.5], atol=1e-6)


def test_letterbox_geometry(rng):
    canvas, hw = canvas_with_image(rng=rng)
    imgs, scale, pad = letterbox_batch(canvas[None], hw[None], 32)
    # scale = min(32/40, 32/48) = 2/3; pads: y: (32-40*2/3)/2, x: (32-32)/2=0
    np.testing.assert_allclose(np.asarray(scale[0]), [32 / 48, 32 / 48], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(pad[0]), [(32 - 40 * 32 / 48) / 2, 0], atol=1e-5)
    assert imgs.shape == (1, 32, 32, 3)
    out = np.asarray(imgs[0])
    # letterbox bands are gray
    assert np.allclose(out[0], 127 / 255, atol=0.02)
    assert np.allclose(out[-1], 127 / 255, atol=0.02)


def test_stretch_geometry(rng):
    from yolojax.data.transform import stretch_batch

    canvas, hw = canvas_with_image(rng=rng)  # image 40×48
    imgs, scale, pad = stretch_batch(canvas[None], hw[None], 32)
    np.testing.assert_allclose(np.asarray(scale[0]), [32 / 40, 32 / 48], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(pad[0]), [0, 0])
    out = np.asarray(imgs[0])
    # no gray bands: the whole output is image content (corners not gray)
    assert not np.allclose(out[0], 127 / 255, atol=0.02)


def test_letterbox_pixel_mapping():
    # image with a bright pixel at known position maps to predicted output loc
    c, h, w = 64, 32, 32
    img = np.zeros((h, w, 3), np.uint8)
    img[8, 24] = 255
    canvas, hw = canvas_with_image(c, h, w, value=img)
    imgs, scale, pad = letterbox_batch(canvas[None], hw[None], 32)
    out = np.asarray(imgs[0]).sum(-1)
    # scale=1, pad=0 → identity mapping of the image region
    assert np.unravel_index(out.argmax(), out.shape) == (8, 24)


def test_augment_disabled_is_letterbox_like(rng):
    """With all transforms off and square image == out size, output ≈ input."""
    c = 64
    img = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
    canvas, hw = canvas_with_image(c, 32, 32, value=img)
    aug = TrainAugment(crop=False, flip=False, hsv=False)
    yx_min = np.asarray([[[0.25, 0.25]]], np.float32)
    yx_max = np.asarray([[[0.75, 0.75]]], np.float32)
    valid = np.ones((1, 1), bool)
    out, omin, omax, ovalid = aug(jax.random.PRNGKey(0), canvas[None], hw[None],
                                  yx_min, yx_max, valid, 32)
    np.testing.assert_allclose(np.asarray(out[0]), img / 255.0, atol=0.03)
    np.testing.assert_allclose(np.asarray(omin), yx_min, atol=1e-6)
    np.testing.assert_allclose(np.asarray(omax), yx_max, atol=1e-6)
    assert bool(ovalid[0, 0])


def test_augment_flip_transforms_boxes():
    c = 64
    img = np.zeros((32, 32, 3), np.uint8)
    img[:, :16] = 200  # left half bright
    canvas, hw = canvas_with_image(c, 32, 32, value=img)
    aug = TrainAugment(crop=False, flip=True, hsv=False, flip_prob=1.0)
    yx_min = np.asarray([[[0.0, 0.0]]], np.float32)
    yx_max = np.asarray([[[0.5, 0.25]]], np.float32)
    valid = np.ones((1, 1), bool)
    out, omin, omax, _ = aug(jax.random.PRNGKey(0), canvas[None], hw[None],
                             yx_min, yx_max, valid, 32)
    # bright half now on the right
    o = np.asarray(out[0]).mean(-1)
    assert o[:, 16:].mean() > o[:, :16].mean()
    np.testing.assert_allclose(np.asarray(omin[0, 0]), [0.0, 0.75], atol=1e-5)
    np.testing.assert_allclose(np.asarray(omax[0, 0]), [0.5, 1.0], atol=1e-5)


def test_augment_crop_moves_boxes_consistently(rng):
    """Random crops keep the box over the same image content: verify the
    bright blob's output location matches the transformed box center."""
    c, h, w = 96, 64, 64
    img = np.zeros((h, w, 3), np.uint8)
    img[24:32, 40:48] = 255  # blob
    canvas, hw = canvas_with_image(c, h, w, value=img)
    yx_min = np.asarray([[[24 / 64, 40 / 64]]], np.float32)
    yx_max = np.asarray([[[32 / 64, 48 / 64]]], np.float32)
    valid = np.ones((1, 1), bool)
    aug = TrainAugment(crop=True, flip=False, hsv=False, jitter=0.2)
    for seed in range(5):
        out, omin, omax, ovalid = aug(jax.random.PRNGKey(seed), canvas[None],
                                      hw[None], yx_min, yx_max, valid, 64)
        assert bool(ovalid[0, 0])
        o = np.asarray(out[0]).sum(-1)
        # intensity centroid of the blob (argmax would hit a plateau corner)
        mass = np.clip(o - 1.6, 0, None)  # blob≈3.0, gray border≈1.5, black 0
        ys, xs = np.mgrid[0:64, 0:64]
        cy = (mass * ys).sum() / mass.sum()
        cx = (mass * xs).sum() / mass.sum()
        center = (np.asarray(omin[0, 0]) + np.asarray(omax[0, 0])) / 2 * 64 - 0.5
        assert abs(cy - center[0]) <= 1.0, (seed, cy, center)
        assert abs(cx - center[1]) <= 1.0, (seed, cx, center)


def test_augment_batch_shapes(rng):
    canvas, hw = canvas_with_image(rng=rng)
    b, g = 3, 4
    canvases = np.stack([canvas] * b)
    hws = np.stack([hw] * b)
    yx_min = rng.uniform(0, 0.4, (b, g, 2)).astype(np.float32)
    yx_max = yx_min + 0.3
    valid = np.ones((b, g), bool)
    aug = TrainAugment()
    out, omin, omax, ovalid = aug(jax.random.PRNGKey(0), canvases, hws,
                                  yx_min, yx_max, valid, 32)
    assert out.shape == (3, 32, 32, 3)
    assert omin.shape == (3, 4, 2) and ovalid.shape == (3, 4)
    assert np.asarray(out).min() >= 0 and np.asarray(out).max() <= 1.0 + 1e-5


def test_train_augment_from_config():
    import configparser

    config = configparser.ConfigParser()
    config.add_section("transform")
    config.set("transform", "train",
               "yolojax.data.transform.RandomCrop yolojax.data.transform.HSVJitter")
    config.set("transform", "jitter", "0.3")
    config.set("transform", "antialias", "0")
    aug = TrainAugment.from_config(config)
    assert aug.crop and aug.hsv and not aug.flip
    assert aug.jitter == 0.3
    assert aug.antialias is False
