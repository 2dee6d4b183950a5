#!/usr/bin/env python
"""Emit the per-backbone / per-mode benchmark artifacts for the round
(VERDICT r2 #6: make MobileNet/Tiny perf driver-durable, not DEVNOTES prose).

Runs bench.py in subprocesses (one TPU process at a time — the chip is
exclusive) with the BENCH_MODEL / BENCH_MODE switches and records each JSON
line as BENCH_<TAG>_r<N>.json at the repo root, alongside the driver's own
BENCH_r<N>.json.

    python scripts/bench_all.py --round 03 [--skip e2e]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

JOBS = [
    # artifact tag, env overrides
    ("MOBILENET", {"BENCH_MODEL": "mobilenet"}),
    ("TINY", {"BENCH_MODEL": "tiny"}),
    ("TRAIN", {"BENCH_MODE": "train"}),
    ("MOBILENET_TRAIN", {"BENCH_MODE": "train", "BENCH_MODEL": "mobilenet"}),
    ("TINY_TRAIN", {"BENCH_MODE": "train", "BENCH_MODEL": "tiny"}),
    # pipelined production loop (SURVEY §7 "overlap with compute via
    # prefetch; double-buffer", VERDICT r4 #4): the e2e headline, with batch
    # k+1's host->device transfer riding while step k computes — per the
    # decomposition it should approach max(transfer, device_step)
    ("E2E", {"BENCH_MODE": "e2e", "BENCH_BATCH": "32", "BENCH_ITERS": "10"}),
    # serialized per-phase attribution (host/transfer/device) of the same
    # loop — E2E's diagnostic pair, each phase gated by a fetch, so its
    # rate deliberately reads the phase SUM, not the pipeline
    ("E2E_DECOMP", {"BENCH_MODE": "e2e", "BENCH_BATCH": "32",
                    "BENCH_ITERS": "10", "BENCH_E2E_DECOMP": "1"}),
    # same production loop with the device-resident dataset cache: the
    # working set uploads once and batches gather on-device, so e2e
    # converges to the device rate even behind a starved host/wire.
    # Like E2E, the headline is the PIPELINED loop (gather k+1 dispatches
    # while step k computes); _DECOMP is its serialized attribution pair.
    ("E2E_DEVDATA", {"BENCH_MODE": "e2e", "BENCH_BATCH": "32",
                     "BENCH_ITERS": "30", "BENCH_E2E_DEVDATA": "1"}),
    ("E2E_DEVDATA_DECOMP", {"BENCH_MODE": "e2e", "BENCH_BATCH": "32",
                            "BENCH_ITERS": "30", "BENCH_E2E_DEVDATA": "1",
                            "BENCH_E2E_DECOMP": "1"}),
    # post-bf16-augment train batch re-sweep (VERDICT r3 #5: the r1 sweep
    # 479/678/881/897 @B=32..256 predates the NMS rework + bf16 augment)
    ("TRAIN_B192", {"BENCH_MODE": "train", "BENCH_BATCH": "192"}),
    ("TRAIN_B256", {"BENCH_MODE": "train", "BENCH_BATCH": "256"}),
    # B=1 fused-detect latency (BASELINE config 1; VERDICT r3 #7)
    ("LATENCY", {"BENCH_MODE": "latency"}),
    # the multi-size perf curve (VERDICT r3 #5); 416 stays the headline
    ("320", {"BENCH_SIZE": "320"}),
    ("544", {"BENCH_SIZE": "544"}),
    ("608", {"BENCH_SIZE": "608"}),
    ("TRAIN_320", {"BENCH_MODE": "train", "BENCH_SIZE": "320"}),
    ("TRAIN_544", {"BENCH_MODE": "train", "BENCH_SIZE": "544"}),
    ("TRAIN_608", {"BENCH_MODE": "train", "BENCH_SIZE": "608", "BENCH_BATCH": "64"}),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", required=True, help="round number, e.g. 03")
    ap.add_argument("--skip", nargs="*", default=[], help="tags to skip")
    ap.add_argument("--only", nargs="*", default=None,
                    help="run just these tags (single-job re-runs)")
    args = ap.parse_args()

    for tag, env_over in JOBS:
        if args.only is not None and tag.lower() not in [s.lower() for s in args.only]:
            continue
        if tag.lower() in [s.lower() for s in args.skip]:
            print(f"{tag}: skipped", flush=True)
            continue
        env = dict(os.environ, **env_over)
        print(f"{tag}: running bench.py with {env_over} ...", flush=True)
        try:
            proc = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                                  capture_output=True, text=True, env=env,
                                  timeout=3600)
        except subprocess.TimeoutExpired:
            print(f"{tag}: FAILED (timeout after 3600 s) — continuing", flush=True)
            continue
        line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
        try:
            if proc.returncode != 0:
                raise json.JSONDecodeError("nonzero exit", line, 0)
            rec = json.loads(line)
        except json.JSONDecodeError:
            print(f"{tag}: FAILED (rc={proc.returncode})\n"
                  f"stdout: {proc.stdout[-2000:]}\n"
                  f"stderr: {proc.stderr[-2000:]}", flush=True)
            continue
        # fold stderr JSON diagnostics (e.g. the e2e phase decomposition,
        # which bench.py prints to stderr so the driver metric line stays
        # clean) into the artifact
        for sline in (proc.stderr or "").splitlines():
            sline = sline.strip()
            if sline.startswith("{"):
                try:
                    rec.setdefault("diagnostics", []).append(json.loads(sline))
                except json.JSONDecodeError:
                    pass
        path = os.path.join(REPO, f"BENCH_{tag}_r{args.round}.json")
        with open(path, "w") as f:
            json.dump(rec, f)
            f.write("\n")
        print(f"{tag}: {line} -> {path}", flush=True)


if __name__ == "__main__":
    main()
