#!/usr/bin/env python
"""Headline benchmark: 416×416 Darknet-19 YOLOv2 inference images/sec/chip.

Runs the fully fused on-device path (folded conv+bias+leaky forward → decode
→ per-class NMS) on the default accelerator and prints ONE JSON line.
Baseline: the YOLO9000 paper's 67 FPS at 416×416 on a Titan X
(arXiv:1612.08242 Table 3; the reference repo publishes no numbers of its
own — BASELINE.md).

Env overrides: BENCH_BATCH (default 128), BENCH_ITERS (default 30),
BENCH_MODE=infer|train|e2e|pipeline|latency (default infer),
BENCH_SIZE=320|416|544|608 (default 416; infer/train/latency — the
multi-size perf curve, VERDICT r3 #5), BENCH_MODEL=darknet|tiny|mobilenet.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

# Paper Table 3 (Titan X): FPS at the sizes it publishes. 416 is the
# headline; 544 is the other published point (40 FPS); 288's 91 FPS is the
# nearest anchor below 320 and 608 has no published rate (we reuse 40 FPS as
# the conservative nearest-size baseline for both unpublished sizes).
BASELINE_FPS_BY_SIZE = {288: 91.0, 320: 91.0, 416: 67.0, 544: 40.0, 608: 40.0}
BASELINE_FPS = BASELINE_FPS_BY_SIZE[416]


def _make_infer_run(batch: int, size: int = 416):
    """Build the fused-detect dispatch closure shared by bench_infer and
    scripts/sustained_bench.py: returns ``(run, folded, images, REPEAT)``
    where ``float(run(folded, images))`` executes REPEAT chained in-graph
    detect iterations and fetching the scalar forces completion."""
    import jax

    from __graft_entry__ import _flagship
    from yolojax.models import pallas_active
    from yolojax.models.inference import Inference
    from yolojax.ops.postprocess import postprocess

    # BENCH_MODEL=darknet|tiny|mobilenet selects the backbone (same head)
    model = _flagship(backbone=os.environ.get("BENCH_MODEL", "darknet"))
    params, state = model.init(jax.random.PRNGKey(0))
    # Trained-detector candidate density: darknet trains objectness toward
    # predicted IoU, so background cells (the vast majority) sit near zero.
    # Freshly-initialized weights instead give sigmoid(~0)≈0.5 objectness
    # everywhere, which saturates greedy NMS at its max_out worst case — a
    # density no real deployment produces. Biasing the objectness logit to
    # −6 restores a background-dominated score distribution (measured: ~2.7%
    # of (cell,class) confs clear the 0.005 threshold; mean 22 / max 93 NMS
    # candidates per (image,class) row — still denser than a trained VOC
    # model, so this overstates postprocess work if anything).
    # BENCH_SATURATED=1 keeps the raw init for the absolute worst case.
    if not int(os.environ.get("BENCH_SATURATED", "0")):
        b = np.array(params["out"]["b"])
        b.reshape(-1, 5 + model.num_classes)[:, 4] = -6.0
        params["out"]["b"] = jax.numpy.asarray(b)
    inference = Inference(model)
    folded = inference.fold(params, state)
    # BENCH_PALLAS overrides the kernel selection (e.g. "nms" | "fusedpost")
    tokens = frozenset(os.environ.get("BENCH_PALLAS", "").split(",")) - {""}
    if tokens:
        model.pallas = tokens
    use_fused = pallas_active("fusedpost", model.pallas)
    use_pallas = pallas_active("nms", model.pallas)
    anchors_np = np.asarray(model.anchors)

    def detect_batch(folded, images):
        if use_fused:
            from yolojax.kernels.nms import postprocess_fused_pallas

            raw = model.apply_folded(folded, images)
            out = postprocess_fused_pallas(raw, anchors_np, threshold=0.005,
                                           overlap=0.45, topk=100)
        elif use_pallas:
            from yolojax.kernels.nms import postprocess_pallas

            det = inference(folded, images)
            out = postprocess_pallas(det, threshold=0.005, overlap=0.45, topk=100)
        else:
            det = inference(folded, images)
            out = postprocess(det, threshold=0.005, overlap=0.45, topk=100)
        # scalar summary: fetching it forces the whole pipeline to finish
        # (block_until_ready is unreliable through the axon tunnel)
        return out.conf.sum(dtype=np.float32)

    # REPEAT in-graph iterations per dispatch: the axon tunnel inserts a
    # ~1.3 ms gap between consecutive dispatched executions (a tunnel
    # artifact, not a v5e host cost — DEVNOTES.md), which would understate
    # steady-state device throughput by ~7% at 416². The scalar carry is fed
    # back into the input so XLA cannot CSE or parallelize the repeats.
    REPEAT = 4

    @jax.jit
    def run(folded, images):
        def body(acc, _):
            return detect_batch(
                folded, images + (acc * 1e-20).astype(images.dtype)), None

        acc, _ = jax.lax.scan(body, np.float32(0), None, length=REPEAT)
        return acc

    rng = np.random.default_rng(0)
    images = jax.device_put(rng.uniform(0, 1, (batch, size, size, 3)).astype(np.float32))
    return run, folded, images, REPEAT


def bench_infer(batch: int, iters: int, size: int = 416) -> float:
    run, folded, images, REPEAT = _make_infer_run(batch, size)
    float(run(folded, images))  # compile + warm
    float(run(folded, images))
    t0 = time.perf_counter()
    outs = [run(folded, images) for _ in range(iters)]
    float(outs[-1])  # single-stream ordering: last done ⇒ all done
    dt = time.perf_counter() - t0
    return batch * iters * REPEAT / dt


def bench_latency(batch: int, iters: int, size: int = 416) -> float:
    """Single-image latency: ms for one fused detect dispatch at B=1
    (BASELINE config 1).  Same in-graph REPEAT harness as bench_infer (the
    tunnel's ~1.3 ms inter-dispatch gap would otherwise dominate a 0.8 ms
    kernel); returns ms per image, so the driver JSON stays one number.
    BENCH_BATCH is ignored — latency is defined at batch 1."""
    rate = bench_infer(1, max(iters, 100), size)
    return 1000.0 / rate


def bench_train(batch: int, iters: int, size: int = 416) -> float:
    import jax
    import jax.numpy as jnp
    import optax

    from __graft_entry__ import _flagship
    from yolojax.ops.loss import LossConfig
    from yolojax.parallel.mesh import make_train_step

    # BENCH_MODEL=darknet|tiny|mobilenet selects the backbone (same head),
    # mirroring bench_infer, so train throughput is per-backbone durable too
    model = _flagship(backbone=os.environ.get("BENCH_MODEL", "darknet"))
    params, state = model.init(jax.random.PRNGKey(0))
    optimizer = optax.chain(optax.clip_by_global_norm(5.0),
                            optax.sgd(1e-3, momentum=0.9))
    opt_state = optimizer.init(params)
    weights = {"coord": 1.0, "object": 5.0, "noobject": 1.0, "cls": 1.0, "prior": 0.01}
    step = make_train_step(model, optimizer, weights, LossConfig())

    rng = np.random.default_rng(0)
    g = 30
    center = rng.uniform(0.2, 0.8, (batch, g, 2)).astype(np.float32)
    half = rng.uniform(0.02, 0.3, (batch, g, 2)).astype(np.float32)
    data = {
        "images": jax.device_put(rng.uniform(0, 1, (batch, size, size, 3)).astype(np.float32)),
        "yx_min": np.clip(center - half, 0, 1),
        "yx_max": np.clip(center + half, 0, 1),
        "cls": rng.integers(0, 20, (batch, g)).astype(np.int32),
        "valid": np.ones((batch, g), bool),
    }
    seen = jnp.int32(1 << 30)
    params, state, opt_state, m = step(params, state, opt_state, data, seen)
    float(m["total"])  # force completion; see bench_infer
    t0 = time.perf_counter()
    for _ in range(iters):
        params, state, opt_state, m = step(params, state, opt_state, data, seen)
    float(m["total"])
    dt = time.perf_counter() - t0
    return batch * iters / dt


def bench_e2e(batch: int, iters: int) -> float:
    """True end-to-end train throughput: host decode (memmap cache) → fused
    on-device augmentation → train step, through the real Dataset/Loader and
    the production Train loop body (VERDICT #6: host-vs-device balance as one
    tracked number, not a footnote).

    NOTE this sandbox's host has ONE CPU core (DEVNOTES.md) — on it the
    number is host-bound far below the device train rate; on a real v5e host
    it converges to BENCH_MODE=train.

    BENCH_E2E_DEVDATA=1 runs the same production loop with the
    device-resident dataset cache ([data] device_dataset — the working set
    is uploaded once and batches gather on-device), the framework's answer
    when the host/wire cannot feed the chip: the hot loop ships indices,
    so even through the sandbox tunnel e2e converges to the device rate.
    """
    import argparse
    import shutil
    import tempfile

    from yolojax.cli.cache import main as cache_main
    from yolojax.cli.train import Train
    from yolojax.config import load_config
    from yolojax.data.synth import CLASSES, generate_voc

    devdata = bool(int(os.environ.get("BENCH_E2E_DEVDATA", "0")))
    root = tempfile.mkdtemp(prefix="bench_e2e")
    try:
        voc = generate_voc(root, 256, seed=11)
        category = os.path.join(root, "category")
        with open(category, "w") as f:
            f.write("\n".join(CLASSES))
        overlay = os.path.join(root, "bench.ini")
        with open(overlay, "w") as f:
            f.write(f"""[config]
root = {root}/artifacts
[cache]
datasets = yolojax.data.voc
category = {category}
voc_roots = {voc}
[model]
name = bench_e2e
[data]
batch_size = {batch}
max_boxes = 10
workers = {os.cpu_count() or 4}
decoded_cache = 1
device_dataset = {int(devdata)}
; empty ⇒ derive from multi_scale_max (yolojax.config.get_canvas): this
; 416-pinned run packs/transfers 512² canvases instead of the base 672²
canvas =
[train]
multi_scale_min = 416
multi_scale_max = 416
[summary]
scalar = 1000000
histogram = 1000000
image = 1000000
[save]
interval = 1e9
keep = 1
""")
        base = os.path.join(os.path.dirname(os.path.abspath(__file__)), "config.ini")
        cfg_files = [base, overlay]
        if cache_main(["-c"] + cfg_files) != 0:  # robust under python -O
            raise SystemExit("bench e2e: cache step failed")
        args = argparse.Namespace(batch=None, finetune=None, resume=False,
                                  freeze=None, epochs=1)
        t = Train(args, load_config(cfg_files, ()))
        t.prewarm()
        # warm a full epoch + 2: the first pass over the data populates the
        # decoded-canvas memmap cache, which is steady-state for a real run
        warm = -(-256 // batch) + 2
        it = 0
        import jax
        import jax.numpy as jnp

        from yolojax.parallel.mesh import shard_host_batch

        # BENCH_E2E_DECOMP=1: per-batch host/transfer/device split (VERDICT
        # r3 #4 — the sub-baseline e2e number, decomposed).  The split run
        # serializes each phase with a scalar fetch (~25 ms tunnel round
        # trip each, DEVNOTES), so its TOTAL overstates the pipelined
        # number; it is printed to stderr as a diagnostic, never as the
        # driver metric.
        decomp = bool(int(os.environ.get("BENCH_E2E_DECOMP", "0")))

        @jax.jit
        def _gate_all(tree):
            # One executable whose INPUTS are every transferred buffer: it
            # cannot run until each put lands, so fetching its scalar gates
            # the whole batch.  Fetching one leaf's sum does NOT order the
            # other independent puts through the tunnel (the round-4 e2e
            # decomposition bug — the 25 MB canvas wire time migrated into
            # the device_step column; DEVNOTES).
            return sum(jnp.float32(v.ravel()[0])
                       for v in jax.tree_util.tree_leaves(tree))

        phases = np.zeros(3)  # host, transfer, step (seconds)
        t0 = None
        t_host0 = time.perf_counter()
        keys = ("canvas", "hw", "yx_min", "yx_max", "cls", "valid")
        if devdata:
            source = t.device_data
        elif decomp:
            source = t.loader  # host batches; each phase serialized below
        else:
            # the production pipelined path (SURVEY §7 double-buffer,
            # cli/train.py device_batches): puts for batch k+1 issue on a
            # side thread while step k computes — the headline measures
            # overlap, not the phase sum
            from yolojax.data.loader import overlap_device_puts
            from yolojax.parallel.mesh import batch_sharding

            sharding = batch_sharding(t.mesh)
            source = overlap_device_puts(
                iter(t.loader),
                lambda b: jax.device_put({k: b[k] for k in keys}, sharding))
        for b in source:
            t_host = time.perf_counter()
            key = jax.random.fold_in(t.key, it)
            if decomp and not devdata:
                # single-process shard_host_batch is a no-op (host numpy,
                # shipped at dispatch): put explicitly so the wire time is
                # attributed to the transfer column, not the device step
                dev = jax.device_put(shard_host_batch(
                    t.mesh, {k: b[k] for k in keys}))
            else:  # already device arrays (devdata gather / overlap thread)
                dev = b
            if decomp:
                if t0 is not None:
                    # devdata: this forces the on-device gather instead —
                    # the "transfer" column then reads HBM copy, not wire
                    float(_gate_all(dev))
            t_put = time.perf_counter()
            t.params, t.state, t.opt_state, metrics = t.train_step(
                t.params, t.state, t.opt_state, dev, jnp.int32(0), key, 416)
            if decomp and t0 is not None:
                float(metrics["total"])
            t_step = time.perf_counter()
            if t0 is not None:
                phases += (t_host - t_host0, t_put - t_host, t_step - t_put)
            it += 1
            if it == warm:
                float(metrics["total"])  # drain; see bench_infer
                t0 = time.perf_counter()
            elif it == warm + iters:
                break
            t_host0 = time.perf_counter()
        float(metrics["total"])  # iters steps ran after t0; drain the last
        if decomp:
            import sys

            ms = phases / iters * 1000
            cv = t.loader.dataset.canvas
            batch_mb = batch * (cv * cv * 3 + 4 * 10 * 9 + 16) / 1e6
            print(json.dumps({
                "e2e_decomposition_ms_per_batch": {
                    "host_prep": round(ms[0], 1), "transfer": round(ms[1], 1),
                    "device_step": round(ms[2], 1)},
                "batch": batch,
                "canvas": cv,
                # derived: what the chip does once fed, and the wire rate
                # that starves it (the sandbox tunnel swings 13-83 MB/s
                # session to session — DEVNOTES; a real v5e host feeds over
                # PCIe DMA and converges to the device rate)
                "device_only_img_per_s": round(batch / ms[2] * 1000, 1),
                "tunnel_wire_MB_per_s": (None if devdata else
                                         round(batch_mb / ms[1] * 1000, 1)),
                "device_dataset": devdata,
                "note": "headline is the SERIALIZED end-to-end rate (phase "
                        "sum); device_only_img_per_s is the pipelining "
                        "headroom"},
            ), file=sys.stderr, flush=True)
        return iters * batch / (time.perf_counter() - t0)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def bench_pipeline(batch: int, iters: int) -> float:
    """Host input pipeline: JPEG decode + canvas pack + collate throughput."""
    import tempfile

    import cv2

    from yolojax.data.cache import make_record
    from yolojax.data.dataset import Dataset
    from yolojax.data.loader import Loader

    rng = np.random.default_rng(0)
    tmp = tempfile.mkdtemp(prefix="bench_pipe")
    records = []
    for i in range(256):
        h, w = int(rng.integers(300, 500)), int(rng.integers(300, 500))
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        path = os.path.join(tmp, f"{i}.jpg")
        cv2.imwrite(path, img)
        records.append(make_record(path, [[0.1, 0.1]], [[0.5, 0.5]], [0]))
    dataset = Dataset(records, canvas=672, max_boxes=60)
    loader = Loader(dataset, batch, workers=os.cpu_count() or 4)
    it = iter(loader)
    next(it)  # warm the pool
    t0 = time.perf_counter()
    for _ in range(iters):
        next(it)
    return batch * iters / (time.perf_counter() - t0)


def main():
    batch = int(os.environ.get("BENCH_BATCH", "128"))
    iters = int(os.environ.get("BENCH_ITERS", "30"))
    mode = os.environ.get("BENCH_MODE", "infer")
    which = os.environ.get("BENCH_MODEL", "darknet")
    size = int(os.environ.get("BENCH_SIZE", "416"))
    if which != "darknet" and mode not in ("infer", "train", "latency"):
        # e2e/pipeline build the model from the config overlay and would
        # silently measure the default backbone under a mislabeled metric
        raise SystemExit(f"BENCH_MODEL={which} is not honored by BENCH_MODE={mode}")
    if size != 416 and mode not in ("infer", "train", "latency"):
        raise SystemExit(f"BENCH_SIZE={size} is not honored by BENCH_MODE={mode}")
    model_tag = "" if which == "darknet" else f"_{which}"
    baseline = BASELINE_FPS_BY_SIZE.get(size, BASELINE_FPS)
    if mode == "latency":
        ms = bench_latency(batch, iters, size)
        print(json.dumps({
            "metric": f"yolov2{model_tag}_{size}_detect_latency_ms",
            "value": round(ms, 3),
            "unit": "ms",
            # paper frame time at this size (1000/FPS); >1 = faster
            "vs_baseline": round((1000.0 / baseline) / ms, 3),
        }))
        return
    fns = {"infer": bench_infer, "train": bench_train}
    rate = (fns[mode](batch, iters, size) if mode in fns
            else {"e2e": bench_e2e, "pipeline": bench_pipeline}[mode](batch, iters))
    mode_tag = mode
    if mode == "e2e" and int(os.environ.get("BENCH_E2E_DEVDATA", "0") or 0):
        mode_tag = "e2e_devdata"
    print(json.dumps({
        "metric": f"yolov2{model_tag}_{size}_{mode_tag}_images_per_sec_per_chip",
        "value": round(rate, 2),
        "unit": "images/sec",
        "vs_baseline": round(rate / baseline, 3),
    }))


if __name__ == "__main__":
    main()
