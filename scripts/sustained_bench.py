#!/usr/bin/env python
"""Sustained-throughput stability for the fused 416 detect path.

The headline bench (`bench.py`) measures ~4 s of steady state; nothing yet
shows the rate HOLDS over a serving-shaped window, or that the client
process doesn't grow (the axon tunnel client leaked host->device transfers
once already — DEVNOTES round 2, fixed by keeping pixels device-resident).
This script runs the identical fused dispatch (`bench._make_infer_run`) for
~N seconds in fetch-gated windows and records:

- per-window aggregate rates (window-level, so the tunnel's ~1.3 ms
  inter-dispatch gap and scalar-fetch RTT are *included*, identically, in
  every window — honest through-the-tunnel numbers, not device tails);
- drift: mean of the last quartile of windows vs the first quartile
  (thermal throttle / leak-shaped degradation would show here);
- window rate p5/p50/p95 (dispersion across windows);
- client RSS at start/end (the round-2 leak grew ~MBs per transfer; a flat
  RSS over hundreds of dispatches is the regression evidence).

Writes BENCH_SUSTAINED_r<round>.json at the repo root with the same
metric/value/unit/vs_baseline driver schema plus the stability fields.

    python scripts/sustained_bench.py --round 05 [--seconds 60]
        [--batch 128] [--size 416] [--window 8]

Scope: one real v5e chip behind the axon tunnel; single-stream dispatch.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return float("nan")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", required=True, help="round number, e.g. 05")
    ap.add_argument("--seconds", type=float, default=60.0,
                    help="target sustained duration (wall, post-warmup)")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--size", type=int, default=416)
    ap.add_argument("--window", type=int, default=8,
                    help="dispatches per fetch-gated timing window")
    args = ap.parse_args()

    import bench

    run, folded, images, repeat = bench._make_infer_run(args.batch, args.size)
    float(run(folded, images))  # compile + warm
    float(run(folded, images))
    rss_start = _rss_mb()

    imgs_per_window = args.batch * repeat * args.window
    rates: list[float] = []
    t_begin = time.perf_counter()
    while time.perf_counter() - t_begin < args.seconds:
        t0 = time.perf_counter()
        outs = [run(folded, images) for _ in range(args.window)]
        float(outs[-1])  # single-stream ordering: last done => all done
        rates.append(imgs_per_window / (time.perf_counter() - t0))
    duration = time.perf_counter() - t_begin
    rss_end = _rss_mb()

    rates_np = np.asarray(rates)
    q = max(1, len(rates) // 4)
    first_q = float(rates_np[:q].mean())
    last_q = float(rates_np[-q:].mean())
    overall = imgs_per_window * len(rates) / duration
    baseline = bench.BASELINE_FPS_BY_SIZE[args.size]
    rec = {
        "metric": f"sustained_infer_{args.size}",
        "value": round(overall, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(overall / baseline, 2),
        "seconds": round(duration, 1),
        "windows": len(rates),
        "dispatches": len(rates) * args.window,
        "batch": args.batch,
        "in_graph_repeat": repeat,
        "window_rate_p5": round(float(np.percentile(rates_np, 5)), 2),
        "window_rate_p50": round(float(np.percentile(rates_np, 50)), 2),
        "window_rate_p95": round(float(np.percentile(rates_np, 95)), 2),
        "drift_last_vs_first_quartile": round(last_q / first_q - 1.0, 4),
        "rss_mb_start": round(rss_start, 1),
        "rss_mb_end": round(rss_end, 1),
        "note": ("window rates include tunnel dispatch gap + scalar-fetch "
                 "RTT identically per window; drift/RSS are the stability "
                 "claims, the rate scope matches bench.py's headline"),
    }
    path = os.path.join(REPO, f"BENCH_SUSTAINED_r{args.round}.json")
    with open(path, "w") as f:
        json.dump(rec, f)
        f.write("\n")
    print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
