"""Data layer tests: parsers, cache schema, canvas packing, loader."""

import configparser
import json
import os

import numpy as np
import pytest

from yolojax.data import coco as coco_mod
from yolojax.data import voc as voc_mod
from yolojax.data.cache import load_cache, make_record
from yolojax.data.dataset import Dataset, collate
from yolojax.data.loader import Loader

VOC_XML = """<annotation>
  <size><width>200</width><height>100</height><depth>3</depth></size>
  <object><name>dog</name><difficult>0</difficult>
    <bndbox><xmin>21</xmin><ymin>11</ymin><xmax>120</xmax><ymax>60</ymax></bndbox>
  </object>
  <object><name>cat</name><difficult>1</difficult>
    <bndbox><xmin>1</xmin><ymin>1</ymin><xmax>200</xmax><ymax>100</ymax></bndbox>
  </object>
  <object><name>unicorn</name><difficult>0</difficult>
    <bndbox><xmin>5</xmin><ymin>5</ymin><xmax>10</xmax><ymax>10</ymax></bndbox>
  </object>
</annotation>"""


def test_voc_parse_normalizes_and_flags(tmp_path):
    xml = tmp_path / "a.xml"
    xml.write_text(VOC_XML)
    rec = voc_mod.parse_annotation(str(xml), "img.jpg", {"dog": 3, "cat": 7})
    assert rec["path"] == "img.jpg"
    # 1-based → 0-based, normalized by (h=100, w=200), yx order
    np.testing.assert_allclose(rec["yx_min"][0], [10 / 100, 20 / 200])
    np.testing.assert_allclose(rec["yx_max"][0], [59 / 100, 119 / 200])
    np.testing.assert_array_equal(rec["cls"], [3, 7])        # unicorn skipped
    np.testing.assert_array_equal(rec["difficult"], [False, True])


def test_voc_load_walks_image_sets(tmp_path):
    root = tmp_path / "VOC2007"
    (root / "ImageSets" / "Main").mkdir(parents=True)
    (root / "Annotations").mkdir()
    (root / "ImageSets" / "Main" / "trainval.txt").write_text("000001\n")
    (root / "Annotations" / "000001.xml").write_text(VOC_XML)
    config = configparser.ConfigParser()
    config.add_section("cache")
    config.set("cache", "voc_roots", str(root))
    recs = voc_mod.load(config, "train", ["dog", "cat"])
    assert len(recs) == 1
    assert recs[0]["path"].endswith("JPEGImages/000001.jpg")
    assert voc_mod.load(config, "test", ["dog"]) == []  # no test.txt → skip


def test_coco_parse(tmp_path):
    db = {
        "images": [{"id": 1, "file_name": "x.jpg", "width": 400, "height": 200},
                   {"id": 2, "file_name": "y.jpg", "width": 100, "height": 100}],
        "annotations": [
            {"image_id": 1, "category_id": 18, "bbox": [40, 20, 100, 60], "iscrowd": 0},
            {"image_id": 1, "category_id": 99, "bbox": [0, 0, 10, 10], "iscrowd": 0},
            {"image_id": 2, "category_id": 18, "bbox": [10, 10, 20, 20], "iscrowd": 1},
        ],
        "categories": [{"id": 18, "name": "dog"}, {"id": 99, "name": "dragon"}],
    }
    (tmp_path / "annotations").mkdir()
    path = tmp_path / "annotations" / "instances_val2007.json"
    path.write_text(json.dumps(db))
    recs = coco_mod.parse_instances(str(path), str(tmp_path), ["cat", "dog"])
    assert len(recs) == 2
    r1 = recs[0]
    np.testing.assert_allclose(r1["yx_min"][0], [20 / 200, 40 / 400])
    np.testing.assert_allclose(r1["yx_max"][0], [80 / 200, 140 / 400])
    assert r1["cls"][0] == 1  # remapped by name to our index
    assert len(r1["cls"]) == 1  # unknown category dropped
    assert recs[1]["difficult"][0]  # iscrowd → difficult
    assert recs[1]["path"].endswith("val2007/y.jpg")


def synthetic_dataset(n=4, canvas=64, max_boxes=5, img_hw=(40, 48)):
    h, w = img_hw
    rng = np.random.default_rng(7)
    images = {f"img{i}": rng.integers(0, 255, (h, w, 3), dtype=np.uint8) for i in range(n)}
    records = [make_record(f"img{i}", [[0.25, 0.25]], [[0.75, 0.75]], [i % 3])
               for i in range(n)]
    ds = Dataset(records, canvas=canvas, max_boxes=max_boxes,
                 imread=lambda p: images[p])
    return ds, images


def test_synth_coco_roundtrips_through_parser(tmp_path):
    """generate_coco output parses through data/coco.py with correct boxes,
    class remap (non-contiguous ids), and iscrowd → difficult mapping."""
    from yolojax.data.synth import generate_coco, make_classes

    classes, colors = make_classes(20)
    assert len(classes) == len(set(classes)) == 20
    assert len(colors) == 20
    root = generate_coco(str(tmp_path), n_images=6, num_classes=20,
                         crowd_frac=1.0)  # every annotation iscrowd
    for split, n in (("train2017", 3), ("val2017", 3)):
        path = os.path.join(root, "annotations", f"instances_{split}.json")
        recs = coco_mod.parse_instances(path, root, classes)
        assert 1 <= len(recs) <= n
        for r in recs:
            assert os.path.exists(r["path"])
            assert (r["yx_min"] >= 0).all() and (r["yx_max"] <= 1).all()
            assert (r["yx_max"] > r["yx_min"]).all()
            assert r["cls"].min() >= 0 and r["cls"].max() < 20
            assert r["difficult"].all()  # crowd_frac=1 → all flagged


def test_dataset_canvas_packing_and_padding():
    ds, images = synthetic_dataset()
    item = ds.load(0)
    assert item["canvas"].shape == (64, 64, 3)
    np.testing.assert_array_equal(item["hw"], [40, 48])
    oy, ox = (64 - 40) // 2, (64 - 48) // 2
    np.testing.assert_array_equal(item["canvas"][oy:oy + 40, ox:ox + 48], images["img0"])
    assert (item["canvas"][0] == 127).all()  # gray border
    assert item["valid"].sum() == 1 and item["cls"].shape == (5,)


def test_dataset_downscales_oversized():
    rng = np.random.default_rng(0)
    big = rng.integers(0, 255, (128, 256, 3), dtype=np.uint8)
    ds = Dataset([make_record("p", [[0, 0]], [[1, 1]], [0])], canvas=64,
                 imread=lambda p: big)
    item = ds.load(0)
    np.testing.assert_array_equal(item["hw"], [32, 64])


def test_loader_epoch_batching():
    ds, _ = synthetic_dataset(n=10)
    loader = Loader(ds, batch_size=4, workers=2, seed=0)
    batches = list(loader.epoch())
    assert len(batches) == 2  # drop_last
    assert batches[0]["canvas"].shape == (4, 64, 64, 3)
    assert batches[0]["yx_min"].shape == (4, 5, 2)
    seen = np.concatenate([b["index"] for b in batches])
    assert len(set(seen.tolist())) == 8  # no duplicates within epoch


def test_cache_roundtrip(tmp_path, monkeypatch):
    from yolojax.data import cache as cache_mod

    config = configparser.ConfigParser()
    for section in ("config", "cache"):
        config.add_section(section)
    config.set("config", "root", str(tmp_path))
    config.set("cache", "category", "config/category/20")
    config.set("cache", "datasets", "tests.test_data")
    out = cache_mod.cache(config, phases=("train",))
    assert len(out["train"]) == 2
    loaded = load_cache(config, "train")
    assert loaded[0]["path"] == "a.jpg"
    np.testing.assert_array_equal(loaded[0]["cls"], [0])


def load(config, phase, category):
    """Fake dataset module hook for test_cache_roundtrip."""
    return [make_record("a.jpg", [[0.1, 0.1]], [[0.5, 0.5]], [0]),
            make_record("b.jpg", [[0.2, 0.2]], [[0.9, 0.9]], [1])]


def test_loader_multihost_sharding():
    """Seed-synchronized shards are disjoint and exhaustive (SURVEY.md §2.17
    multi-host data path)."""
    ds, _ = synthetic_dataset(n=12)
    seen = []
    for rank in range(3):
        loader = Loader(ds, batch_size=2, workers=1, seed=5, shard=(rank, 3))
        for b in loader.epoch():
            seen.extend(b["index"].tolist())
    assert sorted(seen) == list(range(12))


def test_decoded_cache_memmap(tmp_path):
    """Decoded-canvas cache returns identical items and survives re-attach."""
    ds, _ = synthetic_dataset(n=5)
    plain = [ds.load(i) for i in range(5)]
    cached = Dataset(ds.records, canvas=64, max_boxes=5, imread=ds.imread,
                     decoded_dir=str(tmp_path))
    for i in range(5):
        item = cached.load(i)
        np.testing.assert_array_equal(item["canvas"], plain[i]["canvas"])
        np.testing.assert_array_equal(item["hw"], plain[i]["hw"])
    # re-attach uses the existing memmap (no imread needed)
    blind = Dataset(ds.records, canvas=64, max_boxes=5,
                    imread=lambda p: (_ for _ in ()).throw(RuntimeError("no decode")),
                    decoded_dir=str(tmp_path))
    np.testing.assert_array_equal(blind.load(2)["canvas"], plain[2]["canvas"])
