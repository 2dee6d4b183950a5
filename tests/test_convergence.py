"""Slow end-to-end convergence regression (opt-in: YOLOJAX_SLOW_TESTS=1).

Overfits Tiny-Darknet on the synthetic 6-image VOC workspace and requires
perfect mAP@0.3 — validating the full loop (loss → train → decode → NMS →
letterbox inversion → AP) in a way unit oracles cannot.  ~10 min on CPU.
"""

import json
import os

import pytest

pytestmark = pytest.mark.skipif(not os.environ.get("YOLOJAX_SLOW_TESTS"),
                                reason="set YOLOJAX_SLOW_TESTS=1 (slow)")


def test_overfit_reaches_full_map_at_iou03(workspace, capsys):
    from yolojax.cli.cache import main as cache_main
    from yolojax.cli.eval import main as eval_main
    from yolojax.cli.train import main as train_main

    root, cfg = workspace
    cache_main(cfg)
    mods = ["-m", "train/learning_rate=3e-3", "train/multi_scale_min=64",
            "train/multi_scale_max=64", "transform/train=",
            "summary/scalar=200", "model/name=convergence"]
    assert train_main(cfg + ["--steps", "600"] + mods) == 0
    assert eval_main(cfg + ["--size", "64", "-m", "eval/threshold=0.05",
                            "eval/iou=0.3", "model/name=convergence"]) == 0
    out = capsys.readouterr().out
    map_val = float(out.strip().rsplit("=", 1)[1])
    assert map_val > 0.95, out


# reuse the synthetic workspace fixture
from test_cli_end_to_end import workspace  # noqa: E402,F401
