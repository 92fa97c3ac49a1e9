"""Wall-clock stage timing (reference: tracking_utils/timer.py + the per-stage
accumulators in detector.run, detector.py:113-190)."""

from __future__ import annotations

import time
from typing import Dict, List


class AverageMeter:
    """Running average (utils/utils.py:8-25)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n=1):
        self.val = val
        self.sum += val * n
        self.count += n
        if self.count > 0:
            self.avg = self.sum / self.count


class Timer:
    def __init__(self):
        self.total_time = 0.0
        self.calls = 0
        self.start_time = 0.0
        self.duration = 0.0

    def tic(self):
        self.start_time = time.time()

    def toc(self, average=True):
        self.duration = time.time() - self.start_time
        self.total_time += self.duration
        self.calls += 1
        if average:
            self.duration = self.total_time / self.calls
        return self.duration

    def clear(self):
        self.__init__()


class StageTimers:
    def __init__(self, stages: List[str]):
        self.meters: Dict[str, AverageMeter] = {s: AverageMeter() for s in stages}

    def add(self, stage: str, dt: float):
        self.meters[stage].update(dt)

    def summary(self) -> str:
        return " ".join(
            f"{s} {m.avg * 1000:.1f}ms" for s, m in self.meters.items()
        )

    def reset(self):
        for m in self.meters.values():
            m.reset()
