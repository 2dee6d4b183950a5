"""End-to-end CLI integration: cache → train → eval → detect → demo_data on a
synthetic VOC-style dataset (SURVEY.md §4: the e2e smoke tests the reference
never had)."""

import os

import numpy as np
import pytest

CLASSES = ["square", "blob"]


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    """Synthetic VOC layout + config overlay; returns (root, config_args)."""
    import cv2

    root = tmp_path_factory.mktemp("ws")
    voc = root / "VOC2007"
    (voc / "ImageSets" / "Main").mkdir(parents=True)
    (voc / "Annotations").mkdir()
    (voc / "JPEGImages").mkdir()

    rng = np.random.default_rng(3)
    ids = []
    for i in range(6):
        h, w = 96, 128
        img = np.full((h, w, 3), 40, np.uint8)
        # one bright square per image at a random position, class alternates
        cls = i % 2
        y0 = int(rng.integers(8, h - 40))
        x0 = int(rng.integers(8, w - 40))
        color = (255, 64, 64) if cls == 0 else (64, 255, 64)
        img[y0:y0 + 32, x0:x0 + 32] = color
        image_id = f"{i:06d}"
        ids.append(image_id)
        cv2.imwrite(str(voc / "JPEGImages" / f"{image_id}.jpg"), img[:, :, ::-1])
        (voc / "Annotations" / f"{image_id}.xml").write_text(f"""<annotation>
<size><width>{w}</width><height>{h}</height></size>
<object><name>{CLASSES[cls]}</name><difficult>0</difficult>
<bndbox><xmin>{x0 + 1}</xmin><ymin>{y0 + 1}</ymin><xmax>{x0 + 32}</xmax><ymax>{y0 + 32}</ymax></bndbox>
</object></annotation>""")
    (voc / "ImageSets" / "Main" / "trainval.txt").write_text("\n".join(ids))
    (voc / "ImageSets" / "Main" / "val.txt").write_text("\n".join(ids[:4]))
    (voc / "ImageSets" / "Main" / "test.txt").write_text("\n".join(ids[:4]))

    category = root / "category2"
    category.write_text("\n".join(CLASSES))
    anchors = root / "anchors.tsv"
    anchors.write_text("1.0\t1.0\n2.5\t2.5\n")

    overlay = root / "test.ini"
    overlay.write_text(f"""[config]
root = {root}/artifacts
[cache]
datasets = yolojax.data.voc
category = {category}
voc_roots = {voc}
[model]
name = e2e
dnn = yolojax.models.darknet.Tiny
anchors = {anchors}
dtype = float32
[data]
batch_size = 2
max_boxes = 5
canvas = 160
sizes = 64,64
workers = 2
[train]
learning_rate = 1e-4
clip = 5.0
multi_scale_min = 64
multi_scale_max = 96
multi_scale_interval = 2
prewarm = 0
warmup_seen = 0
seed = 0
[loss]
threshold = 0.6
[eval]
phase = test
threshold = 0.01
topk = 10
batch_size = 2
[detect]
threshold = 0.05
topk = 5
[summary]
scalar = 1
histogram = 0
image = 2
[save]
interval = 1e9
keep = 3
""")
    base = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "config.ini")
    return root, ["-c", base, str(overlay)]


def test_cache_cli(workspace):
    root, cfg = workspace
    from yolojax.cli.cache import main

    assert main(cfg) == 0
    assert (root / "artifacts" / "cache" / "category2" / "train.pkl").exists()


def test_train_cli(workspace):
    from yolojax.cli.train import main

    root, cfg = workspace
    assert main(cfg + ["--steps", "3"]) == 0
    model_dir = root / "artifacts" / "model" / "category2" / "Tiny" / "e2e"
    names = os.listdir(model_dir)
    assert "3.npz" in names
    assert "scalars.jsonl" in names


def test_train_cli_resume(workspace):
    from yolojax.cli.train import main

    root, cfg = workspace
    assert main(cfg + ["--steps", "5", "-r"]) == 0
    model_dir = root / "artifacts" / "model" / "category2" / "Tiny" / "e2e"
    assert "5.npz" in os.listdir(model_dir)


def test_train_cli_device_dataset(workspace):
    """`[data] device_dataset = 1` trains through the on-device gather path
    (data/device_cache.py) with the same CLI surface."""
    from yolojax.cli.train import main

    root, cfg = workspace
    assert main(cfg + ["-m", "data/device_dataset=1",
                       "-m", "model/name=e2e_devdata", "--steps", "2"]) == 0
    model_dir = root / "artifacts" / "model" / "category2" / "Tiny" / "e2e_devdata"
    assert "2.npz" in os.listdir(model_dir)


def test_eval_cli(workspace, capsys):
    from yolojax.cli.eval import main

    root, cfg = workspace
    assert main(cfg + ["--size", "64"]) == 0
    out = capsys.readouterr().out
    assert "mAP = " in out
    assert (root / "artifacts" / "model" / "category2" / "Tiny" / "e2e"
            / "eval.jsonl").exists()


def test_eval_cli_coco_protocol(workspace, capsys):
    """[eval] protocol = coco → AP@[.5:.95] path through the real CLI."""
    from yolojax.cli.eval import main

    root, cfg = workspace
    assert main(cfg + ["--size", "64", "-m", "eval/protocol=coco"]) == 0
    out = capsys.readouterr().out
    assert "mAP = " in out


def test_tiny_overlay_cli(workspace, capsys):
    """The shipped config/tiny.ini overlay (SURVEY §2.7: tiny-yolo-voc
    config + anchors) trains and evals through the real CLIs when stacked on
    a workspace config (VERDICT r2 #7)."""
    from yolojax.cli.eval import main as eval_main
    from yolojax.cli.train import main as train_main

    root, cfg = workspace
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # stacked LAST so the overlay's own dnn/name/anchors values win
    tiny = cfg + [os.path.join(repo, "config", "tiny.ini"),
                  "-m", "model/dtype=float32"]
    assert train_main(tiny + ["--steps", "2"]) == 0
    model_dir = root / "artifacts" / "model" / "category2" / "Tiny" / "tiny"
    assert "2.npz" in os.listdir(model_dir)
    assert eval_main(tiny + ["--size", "64"]) == 0
    assert "mAP = " in capsys.readouterr().out


def test_detect_cli(workspace):
    from yolojax.cli.detect import main

    root, cfg = workspace
    img = str(root / "VOC2007" / "JPEGImages" / "000000.jpg")
    out = str(root / "det.png")
    assert main(cfg + ["--size", "64", "-o", out, img]) == 0
    assert os.path.exists(out)


def test_detect_cli_video(workspace):
    """Video-file input drives the same frame loop as the camera path and
    writes one annotated video with -o (the camera branch itself is covered
    by test_detect_cli_camera with a faked capture)."""
    import cv2

    from yolojax.cli.detect import main

    root, cfg = workspace
    src = str(root / "clip.avi")
    writer = cv2.VideoWriter(src, cv2.VideoWriter_fourcc(*"MJPG"), 10.0, (128, 96))
    for i in range(3):
        img = cv2.imread(str(root / "VOC2007" / "JPEGImages" / f"{i:06d}.jpg"))
        writer.write(img)
    writer.release()

    out = str(root / "det.avi")
    assert main(cfg + ["--size", "64", "-o", out, src]) == 0
    cap = cv2.VideoCapture(out)
    frames = 0
    while cap.read()[0]:
        frames += 1
    cap.release()
    assert frames == 3


def test_detect_cli_camera(workspace, monkeypatch):
    """Integer input drives the camera branch (cli/detect.py: the
    ``input.isdigit()`` arm) through the real CLI with ``cv2.VideoCapture``
    faked to serve synthetic frames — the only part a sandbox cannot test is
    the physical device, not the code path."""
    import cv2

    from yolojax.cli.detect import main

    root, cfg = workspace
    frames = [cv2.imread(str(root / "VOC2007" / "JPEGImages" / f"{i:06d}.jpg"))
              for i in range(3)]
    opened = []

    class FakeCamera:
        def __init__(self, index):
            assert index == 0  # detect.py must pass the parsed camera index
            self._n = 0
            opened.append(self)

        def read(self):
            if self._n >= len(frames):
                return False, None
            self._n += 1
            return True, frames[self._n - 1]

        def get(self, prop):
            return 10.0 if prop == cv2.CAP_PROP_FPS else 0.0

        def release(self):
            self.released = True

    real_capture = cv2.VideoCapture
    monkeypatch.setattr(
        cv2, "VideoCapture",
        lambda arg: FakeCamera(arg) if isinstance(arg, int) else real_capture(arg))

    out = str(root / "cam.avi")
    assert main(cfg + ["--size", "64", "-o", out, "0"]) == 0
    assert opened and opened[0].released
    cap = real_capture(out)
    n = 0
    while cap.read()[0]:
        n += 1
    cap.release()
    assert n == 3


def test_demo_data_cli(workspace):
    from yolojax.cli.demo_data import main

    root, cfg = workspace
    out = str(root / "demo")
    assert main(cfg + ["-n", "2", "--size", "64", "-o", out]) == 0
    assert len(os.listdir(out)) == 2


def test_estimate_cli(workspace, capsys):
    from yolojax.cli.estimate import main

    root, cfg = workspace
    out = str(root / "anchors_est.tsv")
    assert main(cfg + ["-k", "2", "--size", "64", "-o", out]) == 0
    anchors = np.loadtxt(out)
    assert anchors.shape == (2, 2)


def test_prune_cli(workspace):
    from yolojax.cli.prune import main

    root, cfg = workspace
    out = str(root / "pruned")
    assert main(cfg + ["--ratio", "0.2", "-o", out]) == 0
    assert os.path.exists(os.path.join(out, "channels.json"))
    # pruned model evaluates under the channels override
    from yolojax.cli.eval import main as eval_main

    import glob
    pruned_ckpt = glob.glob(os.path.join(out, "*.npz"))[0]
    assert eval_main(cfg + ["--size", "64", "-f", pruned_ckpt,
                            "-m", f"model/channels={out}/channels.json"]) == 0


def test_convert_darknet_cli_roundtrip(workspace, capsys):
    from yolojax.cli.convert_darknet import main

    root, cfg = workspace
    ckpt_path = str(root / "artifacts" / "model" / "category2" / "Tiny" / "e2e" / "5.npz")
    weights = str(root / "export.weights")
    assert main(cfg + ["--reverse", "-o", weights, ckpt_path]) == 0
    back = str(root / "reimported.npz")
    assert main(cfg + ["-o", back, weights]) == 0
    assert os.path.exists(back)


def test_export_cli(workspace, capsys):
    from yolojax.cli.export import main

    root, cfg = workspace
    out = str(root / "inference.stablehlo")
    assert main(cfg + ["--size", "64", "-o", out]) == 0
    assert os.path.getsize(out) > 1000


def test_demo_graph_cli(workspace):
    from yolojax.cli.demo_graph import main

    root, cfg = workspace
    out = str(root / "graph")
    assert main(cfg + ["--size", "64", "-o", out]) == 0
    assert os.path.exists(os.path.join(out, "plan.dot"))
    assert os.path.exists(os.path.join(out, "model.hlo"))


def test_receptive_field_cli(workspace, capsys):
    from yolojax.cli.receptive_field import main

    root, cfg = workspace
    assert main(cfg + ["--size", "64"]) == 0
    assert "support=" in capsys.readouterr().out
