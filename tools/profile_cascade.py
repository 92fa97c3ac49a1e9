#!/usr/bin/env python
"""Per-stage profile of the host association cascade at bench load.

The bench's `cascade` bucket (runner._finish) is unpack_dets +
post_process + Tracker.update; this harness reproduces that load without a
device: synthetic detections (K per frame, drifting boxes so tracks persist
and occasionally die/spawn) + precomputed window similarities fed through
``Tracker.update(..., sims=...)``.

Reference cascade being measured: /root/reference/src/lib/utils/tracker.py
(update, 723-1056).

Usage:
  python tools/profile_cascade.py [--frames 100] [--dets 100] [--cprofile]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# force CPU (the box exports JAX_PLATFORMS=axon): this harness measures HOST
# cascade cost in isolation; device-call costs belong to bench.py on the TPU
os.environ["JAX_PLATFORMS"] = "cpu"


def synth_frame_dets(t: int, n: int, rng) -> list:
    dets = []
    for i in range(n):
        # persistent identity i: box drifts smoothly; 10% churn band at the
        # tail spawns/despawns so births/deaths and lost-track pools exercise
        if i > n * 0.9 and (t // 7 + i) % 3 == 0:
            continue
        cx = 100.0 + (i % 20) * 90.0 + 2.0 * t + 3.0 * np.sin(0.1 * t + i)
        cy = 80.0 + (i // 20) * 180.0 + 1.0 * np.cos(0.07 * t + i)
        w = 46.0 + (i % 5) * 4
        h = 98.0 + (i % 7) * 3
        dets.append({
            "bbox": np.array([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
                             np.float32),
            "score": 0.6 + 0.4 * rng.rand(),
            "class": 1,
        })
    return dets


def synth_sims(frame_ids: list, cur_n: int, max_obj: int, window: int,
               id_of: dict, rng) -> np.ndarray:
    """Freshest-first [F, M, M+1] similarity: high where identities match."""
    f = min(len(frame_ids), window)
    sims = rng.rand(window, max_obj, max_obj + 1).astype(np.float32) * 0.25
    for rank in range(f):
        pre = frame_ids[-(rank + 1)]
        pre_ids = id_of[pre]
        for r, pid in enumerate(pre_ids):
            if pid is None:
                continue
            # column index of the same identity in the current frame
            cur_ids = id_of["cur"]
            if pid in cur_ids:
                sims[rank, r, cur_ids.index(pid)] = 0.92 + 0.06 * rng.rand()
    return sims


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=100)
    ap.add_argument("--dets", type=int, default=100)
    ap.add_argument("--dataset", default="mot")
    ap.add_argument("--cprofile", action="store_true")
    ap.add_argument("--worker", action="store_true",
                    help="run updates through the CascadeWorker (threaded)")
    ap.add_argument("--lstm", action="store_true",
                    help="LSTM motion path (nuScenes default): exercises the "
                         "batched end-of-frame predict flush")
    ap.add_argument("--churn", action="store_true",
                    help="untrained-net regime: random boxes + noise sims "
                         "(tracks churn, pools grow to several hundred -- "
                         "the bench's actual max-load shape)")
    args = ap.parse_args()

    from deft_tpu.tracking.tracker import Tracker

    rng = np.random.RandomState(0)
    max_obj = args.dets
    motion = None
    if args.lstm:
        from deft_tpu.tracking.motion_lstm import LSTMMotion

        motion = LSTMMotion(args.dataset)
    tracker = Tracker(args.dataset, max_obj, 128,
                      similarity_fn=None, use_lstm=args.lstm, motion=motion)
    window = 12

    # identity bookkeeping so sims reward true matches
    frame_ids: list = []
    id_of: dict = {}

    # pre-generate all frames' inputs so the timed loop is cascade-only
    frames = []
    for t in range(args.frames):
        if args.churn:
            dets = []
            for i in range(args.dets):
                x1 = rng.rand() * 1800
                y1 = rng.rand() * 1000
                dets.append({
                    "bbox": np.array([x1, y1, x1 + 30 + rng.rand() * 120,
                                      y1 + 40 + rng.rand() * 160], np.float32),
                    "score": rng.rand(),
                    "class": 1,
                })
            sims = (rng.rand(window, max_obj, max_obj + 1)
                    .astype(np.float32) * 0.6)
            frames.append((dets, sims))
            continue
        dets = synth_frame_dets(t, args.dets, rng)
        ids = [i for i in range(args.dets)
               if not (i > args.dets * 0.9 and (t // 7 + i) % 3 == 0)]
        id_of["cur"] = ids
        sims = synth_sims(frame_ids, len(dets), max_obj, window, id_of, rng)
        fid = t + 1
        frame_ids.append(fid)
        id_of[fid] = ids + [None] * (max_obj - len(ids))
        if len(frame_ids) > 50:
            old = frame_ids.pop(0)
            id_of.pop(old, None)
        frames.append((dets, sims[:window]))

    def run():
        ts = []
        for dets, sims in frames:
            t0 = time.perf_counter()
            tracker.update(dets, None, sims=sims)
            ts.append(time.perf_counter() - t0)
        return ts

    if args.cprofile:
        import cProfile
        import pstats

        pr = cProfile.Profile()
        pr.enable()
        ts = run()
        pr.disable()
        stats = pstats.Stats(pr)
        stats.sort_stats("cumulative").print_stats(30)
    else:
        ts = run()

    arr = np.array(ts[10:]) * 1000.0
    print(f"cascade ms/frame: mean {arr.mean():.2f}  p50 {np.median(arr):.2f}"
          f"  p90 {np.percentile(arr, 90):.2f}  max {arr.max():.2f}")
    print(f"tracks: tracked={len(tracker.tracked_stracks)} "
          f"lost={len(tracker.lost_stracks)} removed={len(tracker.removed_stracks)}")


if __name__ == "__main__":
    main()
