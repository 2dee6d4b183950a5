#!/usr/bin/env python
"""Pruning accuracy-recovery gate (VERDICT r3 task #6; SURVEY.md §2.19).

Network slimming's point is not the mask mechanics (unit-tested in
tests/test_tools.py) but that a pruned model *finetunes back to accuracy*.
This gate demonstrates it on the synthetic workspace the main gate trained:

    trained darknet gate checkpoint (6000 steps, mAP@0.5 ~0.89 @416)
      ├─ eval dense           → map_dense
      ├─ prune --ratio R      → BN-γ channel masks (tools/prune.py)
      ├─ eval pruned, frozen  → map_pruned   (the accuracy hit)
      ├─ finetune N steps     → production train CLI under the channels
      │                         override (subprocess: RSS watchdog owns argv)
      └─ eval finetuned       → map_finetuned

Pass criterion (written to SYNTH_GATE_PRUNE.json): the pruned+finetuned
model recovers to within ``max_recovery_deficit`` of the dense mAP@0.5 at
416/stretch.  Frozen at 0.03 — the network-slimming paper (PAPERS.md)
reports ≤1pt VOC drops at comparable ratios; 3pts on this easier synthetic
task is a conservative ceiling, recorded before the first run.

Requires the main gate workspace (scripts/synth_gate.py, darknet/voc) to
exist: ``python scripts/prune_gate.py [--root /tmp/synth_gate]`` — or pass
``--fresh`` to build a dedicated dense source here: generate the synthetic
VOC set, cache, k-means anchors, and train darknet pinned to 416
(multi_scale 416..416, derived canvas 512).  The recovery criterion is
RELATIVE (finetuned vs dense on the same workspace), so the pinned-416
short-budget source is sound evidence for the prune→finetune→recover story;
multi-scale robustness is SYNTH_GATE.json's job, not this gate's.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from synth_gate import write_overlay  # noqa: E402  (sibling script import)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/synth_gate",
                    help="trained darknet/voc gate workspace")
    ap.add_argument("--ratio", type=float, default=0.4,
                    help="fraction of prunable channels to REMOVE")
    ap.add_argument("--finetune-steps", type=int, default=2000)
    ap.add_argument("--finetune-lr", type=float, default=1e-3,
                    help="finetune base LR (decays at 60%%/90%% of the "
                         "budget); network slimming finetunes at the "
                         "production rate, not a timid 1e-4 — the r4 first "
                         "run showed 1e-4*1500 recovers only to -0.10")
    ap.add_argument("--sparsity", type=float, default=0.01,
                    help="[train] sparsity (L1 on BN gamma) for the --fresh "
                         "dense source: channel-importance |gamma| is only "
                         "meaningful when training pushes unimportant scales "
                         "toward zero (network slimming, PAPERS.md)")
    ap.add_argument("--steps", type=int, default=6000,
                    help="the step budget the source gate was trained with")
    ap.add_argument("--skip-finetune", action="store_true",
                    help="reuse the finetuned checkpoint, just re-run evals")
    ap.add_argument("--fresh", action="store_true",
                    help="build the dense source workspace here: generate "
                         "synthetic VOC, cache, estimate anchors, train "
                         "darknet pinned to 416 for --steps")
    ap.add_argument("--images", type=int, default=600,
                    help="--fresh: synthetic dataset size")
    ap.add_argument("--scratch-control", action="store_true",
                    help="equal-budget control (VERDICT r4 #3a): train the "
                         "PRUNED architecture from random init for "
                         "--finetune-steps at the identical finetune LR "
                         "schedule — measures whether pruned-init actually "
                         "beats scratch, or honestly refutes it")
    ap.add_argument("--sweep", default="",
                    help="comma-separated extra sparsity λ values (VERDICT "
                         "r4 #3b): for each, train another dense source on "
                         "the same cache, record BN-γ mass concentration in "
                         "the kept channels and the pre-finetune pruned mAP "
                         "(no finetune — the sweep probes the L1's effect "
                         "on prunability, not recovery)")
    ap.add_argument("--out", default="SYNTH_GATE_PRUNE.json")
    args = ap.parse_args()
    if args.sparsity > 0 and not args.fresh:
        # --sparsity configures the dense SOURCE training, which only happens
        # under --fresh; silently running the known-weaker recipe (r4: a 40%
        # cut of a non-sparsity-trained source is unrecoverable at the old
        # LR) would mislabel the artifact (ADVICE r4 #2)
        ap.error("--sparsity only takes effect with --fresh (it sets "
                 "[train] sparsity for the dense source training); reusing "
                 "an existing workspace keeps however that source was "
                 "trained — pass --sparsity 0 to acknowledge, or --fresh")

    from yolojax.cli import make_parser, setup
    from yolojax.cli.eval import run_eval
    from yolojax.cli.prune import main as prune_main
    from yolojax.cli.common import build, load_weights_auto
    from yolojax.data.cache import load_cache

    root = args.root
    data_root = os.path.join(root, "VOC2007")
    pin = []
    if args.fresh:
        from yolojax.cli.cache import main as cache_main
        from yolojax.cli.estimate import main as estimate_main
        from yolojax.data.synth import generate_voc

        os.makedirs(root, exist_ok=True)
        data_root = generate_voc(root, args.images)
        # pin the whole workspace to 416: one prewarmed executable instead
        # of ten, and [data] canvas derives down to 512 (config.get_canvas),
        # a 1.7x smaller host->device payload per image
        pin = ["-m", "train/multi_scale_min=416",
               "-m", "train/multi_scale_max=416",
               "-m", "data/canvas=",
               "-m", f"train/sparsity={args.sparsity}"]
        overlay = write_overlay(root, data_root, args.steps)
        cfg = ["-c", os.path.join(REPO, "config.ini"), overlay, *pin]
        if cache_main(cfg) != 0:
            raise SystemExit("prune gate: cache step failed")
        if estimate_main(cfg + ["-k", "5", "-o",
                                os.path.join(root, "anchors.tsv")]) != 0:
            raise SystemExit("prune gate: anchor estimation failed")
        # real CLI subprocess: the RSS watchdog self-heals only when it
        # owns argv (see synth_gate.py)
        subprocess.run([sys.executable, os.path.join(REPO, "train.py"),
                        *cfg, "--steps", str(args.steps)], check=True)
    elif not os.path.isdir(data_root):
        raise SystemExit(f"no gate workspace at {root}: run scripts/synth_gate.py first")
    else:
        overlay = write_overlay(root, data_root, args.steps)
        cfg = ["-c", os.path.join(REPO, "config.ini"), overlay]
    pruned_dir = os.path.join(root, "pruned")
    channels = os.path.join(pruned_dir, "channels.json")
    ch_override = ["-m", f"model/channels={channels}"]

    def eval_416(extra, resume=True, fil=None):
        eval_args = make_parser("prune gate eval").parse_args(cfg + extra)
        config = setup(eval_args)
        config.set("transform", "resize", "yolojax.data.transform.stretch")
        category, anchors, model = build(config)
        params, state, meta = load_weights_auto(config, model, fil, resume=resume)
        records = load_cache(config, "test")
        r = run_eval(config, model, params, state, records, 416,
                     config.getint("eval", "batch_size"), category)
        return round(r["map"], 4), int(meta.get("step", 0) or 0)

    t0 = time.time()
    map_dense, dense_step = eval_416([])
    print(f"dense     mAP@0.5 @416: {map_dense:.4f} (step {dense_step})", flush=True)

    # prune the same latest checkpoint the dense eval used
    if prune_main(cfg + ["--ratio", str(args.ratio), "-o", pruned_dir]) != 0:
        raise SystemExit("prune gate: prune step failed")
    pruned_ckpt = os.path.join(pruned_dir, f"{dense_step}.npz")
    map_pruned, _ = eval_416(ch_override, resume=False, fil=pruned_ckpt)
    print(f"pruned    mAP@0.5 @416: {map_pruned:.4f} (ratio {args.ratio})", flush=True)

    # finetune under the channels override in a fresh model dir seeded with
    # the pruned checkpoint; short decaying LR schedule on top of the
    # source budget (resume restores step=dense_step, so milestones are
    # absolute).  Subprocess — the RSS watchdog needs to own argv.
    total = dense_step + args.finetune_steps
    m1, m2 = dense_step + int(args.finetune_steps * 0.6), \
        dense_step + int(args.finetune_steps * 0.9)
    ft_overrides = ch_override + [
        "-m", "model/name=synthgate_darknet_voc_pruned",
        "-m", f"train/learning_rate={args.finetune_lr}",
        "-m", f"train/milestones={m1},{m2}",
        # the L1 pull is a training-for-prunability device; finetune wants
        # pure recovery (and cfg carries the source's sparsity pin)
        "-m", "train/sparsity=0",
    ]
    ft_dir = os.path.join(root, "artifacts", "model", "category8", "Darknet",
                          "synthgate_darknet_voc_pruned")
    if not args.skip_finetune:
        os.makedirs(ft_dir, exist_ok=True)
        shutil.copy2(pruned_ckpt, os.path.join(ft_dir, f"{dense_step}.npz"))
        subprocess.run([sys.executable, os.path.join(REPO, "train.py"), *cfg,
                        *ft_overrides, "-r", "--steps", str(total)], check=True)
    map_finetuned, ft_step = eval_416(ft_overrides)
    print(f"finetuned mAP@0.5 @416: {map_finetuned:.4f} (step {ft_step})", flush=True)

    from yolojax.tools.prune import gamma_concentration

    def load_params(extra):
        a = make_parser("prune gate load").parse_args(cfg + extra)
        c = setup(a)
        _, _, mdl = build(c)
        p, s, meta = load_weights_auto(c, mdl, None, resume=True)
        return mdl, p

    # equal-budget scratch control (VERDICT r4 #3a): same pruned
    # architecture, same step budget, same LR schedule — only the init
    # differs (random vs pruned-from-dense).  Measures, rather than assumes,
    # that slimming transfers useful weights.
    scratch_control = None
    if args.scratch_control:
        s1, s2 = int(args.finetune_steps * 0.6), int(args.finetune_steps * 0.9)
        sc_overrides = ch_override + [
            "-m", "model/name=synthgate_darknet_voc_scratch",
            "-m", f"train/learning_rate={args.finetune_lr}",
            "-m", f"train/milestones={s1},{s2}",
            "-m", "train/sparsity=0",
        ]
        if not args.skip_finetune:
            subprocess.run([sys.executable, os.path.join(REPO, "train.py"),
                            *cfg, *sc_overrides,
                            "--steps", str(args.finetune_steps)], check=True)
        map_scratch, sc_step = eval_416(sc_overrides)
        print(f"scratch   mAP@0.5 @416: {map_scratch:.4f} (step {sc_step}, "
              f"equal budget)", flush=True)
        scratch_control = {
            "map_scratch_416": map_scratch, "steps": args.finetune_steps,
            "lr": args.finetune_lr, "milestones": [s1, s2],
            "architecture": "pruned (same channels.json)",
            "pruned_init_beats_scratch": bool(map_finetuned > map_scratch),
        }

    # sparsity-λ sweep (VERDICT r4 #3b): per λ, a fresh dense source on the
    # SAME cache/anchors, then γ-mass concentration in the kept channels and
    # the pre-finetune pruned mAP — the direct evidence that the L1 knob
    # creates prunability (network slimming), separate from finetune power.
    sweep = []
    main_model, main_params = load_params([])
    sweep.append({
        "sparsity": args.sparsity,
        "gamma_mass_kept": round(gamma_concentration(
            main_model, main_params, args.ratio), 4),
        "map_dense_416": map_dense,
        "map_pruned_416_prefinetune": map_pruned,
        "source": "main",
    })
    for lam_s in [s for s in args.sweep.split(",") if s.strip()]:
        lam = float(lam_s)
        tag = lam_s.strip().replace(".", "p")
        sw_overrides = ["-m", f"model/name=synthgate_darknet_voc_sw{tag}",
                        "-m", f"train/sparsity={lam}"]
        if not args.skip_finetune:
            subprocess.run([sys.executable, os.path.join(REPO, "train.py"),
                            *cfg, *sw_overrides,
                            "--steps", str(args.steps)], check=True)
        sw_dense, sw_step = eval_416(sw_overrides)
        sw_model, sw_params = load_params(sw_overrides)
        conc = gamma_concentration(sw_model, sw_params, args.ratio)
        sw_pruned_dir = os.path.join(root, f"pruned_sw{tag}")
        if prune_main(cfg + sw_overrides + ["--ratio", str(args.ratio),
                                            "-o", sw_pruned_dir]) != 0:
            raise SystemExit(f"prune gate: sweep λ={lam} prune failed")
        sw_ckpt = os.path.join(sw_pruned_dir, f"{sw_step}.npz")
        sw_ch = ["-m", f"model/channels={os.path.join(sw_pruned_dir, 'channels.json')}"]
        sw_map_pruned, _ = eval_416(sw_overrides + sw_ch, resume=False,
                                    fil=sw_ckpt)
        print(f"sweep λ={lam}: dense {sw_dense:.4f}, γ-mass kept "
              f"{conc:.4f}, pruned (pre-finetune) {sw_map_pruned:.4f}",
              flush=True)
        sweep.append({"sparsity": lam, "gamma_mass_kept": round(conc, 4),
                      "map_dense_416": sw_dense,
                      "map_pruned_416_prefinetune": sw_map_pruned,
                      "source": f"sw{tag} ({args.steps} steps, same cache)"})

    max_deficit = 0.03
    ok = (map_finetuned >= map_dense - max_deficit) and ft_step >= total
    with open(channels) as f:
        n_kept = sum(json.load(f).values())
    out = {
        "source": {"workspace": root, "model": "darknet", "step": dense_step,
                   "recipe": ("production config pinned to 416 "
                              "(multi_scale 416..416, derived canvas 512), "
                              f"{args.steps}-step dense source trained with "
                              f"[train] sparsity={args.sparsity} (L1 on BN "
                              "gamma, network slimming) — sound for the "
                              "RELATIVE recovery criterion; multi-scale "
                              "robustness is SYNTH_GATE.json's evidence"
                              if args.fresh else
                              "synth_gate.py production multi-scale recipe")},
        "ratio": args.ratio,
        # round-5 semantics fix (tools/prune.py): ratio is now really the
        # fraction REMOVED; before the fix it was the fraction KEPT, so the
        # round-4 artifact's "0.4 prune" actually removed 60% of channels
        "ratio_semantics": "fraction of prunable channels REMOVED "
                           "(r5 fix; the r4 run's 0.4 removed 60%)",
        "channels_kept": n_kept,
        "map_dense_416": map_dense,
        "map_pruned_416": map_pruned,
        "map_finetuned_416": map_finetuned,
        "recovery_delta": round(map_finetuned - map_dense, 4),
        "sparsity": args.sparsity if args.fresh else 0.0,
        "finetune": {"steps": args.finetune_steps, "lr": args.finetune_lr,
                     "milestones": [m1, m2],
                     "wall_s": round(time.time() - t0, 1)},
        "scratch_control": scratch_control,
        "sparsity_sweep": sweep,
        "criteria": {"max_recovery_deficit": max_deficit},
        "pass": bool(ok),
    }
    with open(os.path.join(REPO, args.out), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
