#!/usr/bin/env python
"""Reconcile bench.py's wall-differential device_ms against a profiler trace.

bench.py's ``device_ms`` is a chunk-vs-single wall differential (honest but
indirect -- VERDICT r2 #4b); this reads the jax.profiler trace that
``bench.py --profile DIR`` captures and reports the DEVICE-side busy time
per frame straight from the xprof timeline: for every device process in
trace.json.gz, the union of its 'X' event intervals (union, not sum, so
overlapping per-core lanes don't double-count).

Reference analog: the per-stage synchronize timing the reference prints
(/root/reference/src/lib/detector.py:534-546) -- same question ("what does
the accelerator actually spend?"), answered from the profiler instead of
host timers.

Usage:
  python tools/trace_device_ms.py DIR --frames 60
  (DIR = the --profile directory; the newest plugins/profile/*/ run is used)
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
from collections import defaultdict


def union_ms(intervals) -> float:
    total = 0.0
    end = -1.0
    for s, e in sorted(intervals):
        if s > end:
            total += e - s
            end = e
        elif e > end:
            total += e - end
            end = e
    return total / 1000.0            # trace ts/dur are microseconds


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--frames", type=int, default=0,
                    help="frames measured while the trace ran (for /frame)")
    args = ap.parse_args()

    runs = sorted(glob.glob(os.path.join(
        args.trace_dir, "plugins", "profile", "*")))
    if not runs:
        raise SystemExit(f"no profile runs under {args.trace_dir}")
    run = runs[-1]
    traces = glob.glob(os.path.join(run, "*.trace.json.gz"))
    if not traces:
        raise SystemExit(f"no trace.json.gz under {run}")

    with gzip.open(traces[0]) as f:
        tr = json.load(f)
    events = tr.get("traceEvents", [])

    proc_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            proc_names[e["pid"]] = e["args"].get("name", "")

    per_pid = defaultdict(list)
    for e in events:
        if e.get("ph") == "X" and "dur" in e:
            per_pid[e["pid"]].append((e["ts"], e["ts"] + e["dur"]))

    out = {"run": os.path.basename(run), "frames": args.frames}
    device_ms = 0.0
    for pid, iv in sorted(per_pid.items()):
        name = proc_names.get(pid, str(pid))
        busy = union_ms(iv)
        key = name.replace("/", "_").strip("_")
        out[f"busy_ms[{name}]"] = round(busy, 2)
        if "TPU" in name or "device:" in name.lower():
            device_ms += busy
    out["device_busy_ms_total"] = round(device_ms, 2)
    if args.frames and device_ms:
        out["device_ms_per_frame"] = round(device_ms / args.frames, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
