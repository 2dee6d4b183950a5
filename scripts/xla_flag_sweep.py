#!/usr/bin/env python
"""XLA flag sweep on the real chip (round-5: the conv roofline lever).

DEVNOTES round-1 closed the single-chip tuning pass at ~59% MXU for fused
416 detect / ~40% for train, naming "XLA flag tuning (terminal controls
XLA_FLAGS here)" the untried lever.  This harness runs bench.py in
subprocesses (one at a time — the chip is exclusive) under candidate
XLA_FLAGS sets and records img/s per set, so a win is measured, durable,
and revertable rather than folklore.

Flags are candidates, not defaults: anything that does not reproducibly
beat baseline stays OUT of the shipped config.  Unknown flags make XLA
abort at client init — each set is validated by the run itself (rc != 0 →
recorded as invalid).

    python scripts/xla_flag_sweep.py [--mode infer|train] [--repeat 2]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Candidate sets, most-promising first.  Scoped VMEM is the documented
# public lever for conv/fusion headroom on TPU (default 16 MiB; v5e has
# 128 MiB VMEM total); the latency-hiding scheduler mostly helps overlap
# but is cheap to measure.
CANDIDATES: list[tuple[str, str]] = [
    ("baseline", ""),
    # validity canary: an absurdly small scoped-VMEM cap must visibly change
    # behavior (error or large slowdown) IF flags reach the compiler behind
    # the axon tunnel — a canary ≈ baseline means the whole sweep is void
    # (flags silently dropped), not that the real candidates are no-ops
    ("canary_vmem128k", "--xla_tpu_scoped_vmem_limit_kib=128"),
    ("vmem48m", "--xla_tpu_scoped_vmem_limit_kib=49152"),
    ("vmem64m", "--xla_tpu_scoped_vmem_limit_kib=65536"),
    ("vmem96m", "--xla_tpu_scoped_vmem_limit_kib=98304"),
    ("lhs", "--xla_tpu_enable_latency_hiding_scheduler=true"),
    ("vmem64m_lhs", "--xla_tpu_scoped_vmem_limit_kib=65536 "
                    "--xla_tpu_enable_latency_hiding_scheduler=true"),
]


def run_once(mode: str, flags: str) -> dict | None:
    env = dict(os.environ)
    if flags:
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + flags).strip()
    if mode != "infer":
        env["BENCH_MODE"] = mode
    proc = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                          capture_output=True, text=True, env=env)
    if proc.returncode != 0:
        return {"error": proc.stderr.strip().splitlines()[-1][:300]
                if proc.stderr.strip() else f"rc={proc.returncode}"}
    for line in reversed(proc.stdout.strip().splitlines()):
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            continue
    return {"error": "no JSON line in bench output"}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="infer", choices=("infer", "train"))
    ap.add_argument("--repeat", type=int, default=2,
                    help="runs per candidate (tunnel wire-speed variance — "
                         "DEVNOTES; keep the MAX per set)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    out_path = args.out or os.path.join(
        REPO, f"XLA_FLAG_SWEEP_{args.mode.upper()}.json")

    results = {}
    for name, flags in CANDIDATES:
        best = None
        for i in range(args.repeat):
            r = run_once(args.mode, flags)
            print(f"{name} [{i + 1}/{args.repeat}]: "
                  f"{r.get('value', r.get('error'))}", flush=True)
            if r and "value" in r and (best is None or r["value"] > best["value"]):
                best = r
            elif r and "error" in r and best is None:
                best = r
        results[name] = {"flags": flags, **(best or {})}
        # persist incrementally: a mid-sweep machine restart keeps partials
        with open(out_path, "w") as f:
            json.dump({"mode": args.mode, "repeat": args.repeat,
                       "results": results}, f, indent=1)
    base = results.get("baseline", {}).get("value")
    if base:
        for name, r in results.items():
            if "value" in r:
                print(f"{name:14s} {r['value']:10.1f} img/s "
                      f"({r['value'] / base:+.1%} vs baseline)"
                      .replace("+", "" if name == "baseline" else "+"),
                      flush=True)
    print(f"wrote {out_path}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
