"""Config system tests: overlays, -m mods, dotted resolution, dirs."""

import os

import numpy as np
import pytest

from yolojax.config import (config_digest, load_config, default_config_path,
                            get_cache_dir, get_model_dir, parse_attr)

ROOT = os.path.dirname(default_config_path())


def test_root_config_constructs_flagship():
    from yolojax.category import get_anchors, get_category
    from yolojax.models import build_model

    config = load_config()
    category = get_category(config)
    anchors = get_anchors(config)
    assert len(category) == 20 and anchors.shape == (5, 2)
    model = build_model(config, anchors, len(category))
    assert type(model).__name__ == "Darknet"
    assert model.pallas == {"nms", "fusedpost"}
    assert model.layer_defs[-1].out_ch == 5 * 25


def test_coco_overlay():
    from yolojax.category import get_anchors, get_category

    config = load_config([default_config_path(), os.path.join(ROOT, "config/coco.ini")])
    assert len(get_category(config)) == 80
    assert get_anchors(config).shape == (5, 2)
    assert "coco" in config.get("cache", "datasets")


def test_mobilenet_overlay():
    from yolojax.models import build_model

    config = load_config([default_config_path(), os.path.join(ROOT, "config/mobilenet.ini")])
    model = build_model(config, np.ones((5, 2), np.float32), 20)
    assert type(model).__name__ == "MobileNet"
    # the overlay ships MobileNet's own recipe: sgd+global-clip starves the
    # head of a 27-conv no-residual stack (DEVNOTES round-3 convergence note)
    assert config.get("train", "optimizer").endswith(".adam")


def test_tiny_overlay():
    from yolojax.category import get_anchors
    from yolojax.models import build_model

    config = load_config([default_config_path(), os.path.join(ROOT, "config/tiny.ini")])
    anchors = get_anchors(config)
    assert anchors.shape == (5, 2)
    # tiny-yolo-voc cfg anchors (w,h) yx-swapped: first row (h,w)=(1.19,1.08)
    np.testing.assert_allclose(anchors[0], [1.19, 1.08])
    np.testing.assert_allclose(anchors[-1], [10.52, 16.62])
    model = build_model(config, anchors, 20)
    assert type(model).__name__ == "Tiny"


def test_modify_overrides_and_new_sections():
    config = load_config(modify=["model/dnn=yolojax.models.darknet.Tiny",
                                 "newsec/key=7"])
    assert config.get("model", "dnn") == "yolojax.models.darknet.Tiny"
    assert config.getint("newsec", "key") == 7
    with pytest.raises(ValueError, match="bad -m"):
        load_config(modify=["oops"])


def test_overlay_later_wins(tmp_path):
    extra = tmp_path / "x.ini"
    extra.write_text("[model]\nname = override\n")
    config = load_config([default_config_path(), str(extra)])
    assert config.get("model", "name") == "override"


def test_dirs_keyed_by_config(tmp_path):
    config = load_config(modify=[f"config/root={tmp_path}"])
    assert get_cache_dir(config) == str(tmp_path / "cache" / "20")
    assert get_model_dir(config) == str(tmp_path / "model" / "20" / "Darknet" / "model")


def test_parse_attr_variants():
    import yolojax.data.voc as voc

    assert parse_attr("yolojax.data.voc") is voc
    assert parse_attr("yolojax.models.darknet.Darknet").__name__ == "Darknet"
    with pytest.raises(AttributeError):
        parse_attr("yolojax.models.darknet.Nonexistent")


def test_config_digest_stable():
    c1 = load_config()
    c2 = load_config()
    assert config_digest(c1, ["model", "cache"]) == config_digest(c2, ["model", "cache"])
    c3 = load_config(modify=["model/name=zzz"])
    assert config_digest(c1, ["model"]) != config_digest(c3, ["model"])


def test_get_canvas_explicit_derived_and_capped():
    from yolojax.config import get_canvas

    # shipped config pins 672 explicitly
    assert get_canvas(load_config()) == 672
    # emptying the key re-enables derivation under a base that sets it:
    # 416-pinned ⇒ ceil32(416·1.2) = 512 (the e2e bench transfer lever)
    config = load_config(modify=["data/canvas=", "train/multi_scale_max=416"])
    assert get_canvas(config) == 512
    # full 320..608 recipe derives past the cap ⇒ historical 672
    config = load_config(modify=["data/canvas=", "train/multi_scale_max=608"])
    assert get_canvas(config) == 672
    # jitter widens the margin
    config = load_config(modify=["data/canvas=", "train/multi_scale_max=416",
                                 "transform/jitter=0.3"])
    assert get_canvas(config) == 544
