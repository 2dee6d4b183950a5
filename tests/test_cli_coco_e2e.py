"""BASELINE config 4 end-to-end (VERDICT r2 #2): a synthetic COCO-format
workspace (generated ``instances_*.json``, 80 classes, non-contiguous
category ids, iscrowd annotations) driven through the REAL CLIs as one
pipeline: cache → estimate (anchor re-clustering) → train → eval with
``protocol = coco`` (AP@[.5:.95])."""

import json
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NUM_CLASSES = 80


@pytest.fixture(scope="module")
def coco_workspace(tmp_path_factory):
    from yolojax.data.synth import generate_coco, make_classes

    root = tmp_path_factory.mktemp("cocows")
    coco = generate_coco(str(root), n_images=12, seed=5,
                         num_classes=NUM_CLASSES, crowd_frac=0.1)

    classes, _ = make_classes(NUM_CLASSES)
    category = root / "category80"
    category.write_text("\n".join(classes))

    overlay = root / "coco_test.ini"
    overlay.write_text(f"""[config]
root = {root}/artifacts
[cache]
datasets = yolojax.data.coco
category = {category}
coco_root = {coco}
[model]
name = coco_e2e
dnn = yolojax.models.darknet.Tiny
anchors = {root}/anchors.tsv
dtype = float32
[data]
batch_size = 2
max_boxes = 8
canvas = 160
sizes = 64,64
workers = 2
[train]
learning_rate = 1e-4
clip = 5.0
multi_scale_min = 64
multi_scale_max = 64
prewarm = 0
warmup_seen = 0
seed = 0
[eval]
phase = val
protocol = coco
threshold = 0.01
topk = 10
batch_size = 2
[summary]
scalar = 1
histogram = 0
image = 0
[save]
interval = 1e9
keep = 2
""")
    base = os.path.join(REPO, "config.ini")
    return root, ["-c", base, str(overlay)]


def test_coco_chain_cache_estimate_train_eval(coco_workspace, capsys):
    from yolojax.cli.cache import main as cache_main
    from yolojax.cli.estimate import main as estimate_main
    from yolojax.cli.eval import main as eval_main
    from yolojax.cli.train import main as train_main
    from yolojax.data.cache import load_cache
    from yolojax.cli import make_parser, setup

    root, cfg = coco_workspace

    # 1. cache: COCO json → record pickles
    assert cache_main(cfg) == 0
    args = make_parser("t").parse_args(cfg)
    config = setup(args)
    train_recs = load_cache(config, "train")
    val_recs = load_cache(config, "val")
    assert len(train_recs) == 6 and len(val_recs) == 6
    for r in train_recs:
        assert os.path.exists(r["path"])          # images resolvable
        assert r["cls"].min() >= 0 and r["cls"].max() < NUM_CLASSES
    # iscrowd → difficult flag survives the parse (crowd_frac > 0)
    assert any(r["difficult"].any() for r in train_recs + val_recs)

    # 2. estimate: k-means anchor re-clustering from the cache (config 4
    #    requirement), written where [model] anchors points
    assert estimate_main(cfg + ["-k", "2", "--size", "64",
                                "-o", str(root / "anchors.tsv")]) == 0
    anchors = np.loadtxt(root / "anchors.tsv")
    assert anchors.shape == (2, 2) and (anchors > 0).all()

    # 3. train: 2 steps through the production train CLI
    assert train_main(cfg + ["--steps", "2"]) == 0
    model_dir = root / "artifacts" / "model" / "category80" / "Tiny" / "coco_e2e"
    assert "2.npz" in os.listdir(model_dir)

    # 4. eval: COCO protocol (AP@[.5:.95] with AP50/AP75) over the val split
    assert eval_main(cfg + ["--size", "64"]) == 0
    out = capsys.readouterr().out
    assert "mAP = " in out
    lines = (model_dir / "eval.jsonl").read_text().strip().splitlines()
    rec = json.loads(lines[-1])
    assert "map_50" in rec and "map_75" in rec  # coco-protocol sub-metrics
    assert 0.0 <= rec["map"] <= 1.0
