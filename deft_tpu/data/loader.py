"""Host-side batching data loader.

Replaces torch's DataLoader for this framework: shuffled epoch order, numpy
collation to fixed-shape batches, and a background thread pool that keeps a
small prefetch queue full so augmentation/warping overlaps device compute
(the reference leans on torch DataLoader workers; here a thread pool is
enough because cv2.warpAffine and numpy release the GIL for the heavy parts).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List, Optional

import numpy as np


def collate(samples: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    keys = samples[0].keys()
    return {k: np.stack([s[k] for s in samples]) for k in keys}


class DataLoader:
    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 num_workers: int = 4, drop_last: bool = True,
                 prefetch: int = 4, seed: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.rng = np.random.RandomState(seed)

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _batches(self) -> List[List[int]]:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)
        batches = [
            order[i: i + self.batch_size].tolist()
            for i in range(0, len(order), self.batch_size)
        ]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches.pop()
        return batches

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        batches = self._batches()
        if self.num_workers <= 1:
            for idxs in batches:
                yield collate([self.dataset[i] for i in idxs])
            return

        with ThreadPoolExecutor(self.num_workers) as pool:
            def load_batch(idxs):
                return collate(list(pool.map(self.dataset.__getitem__, idxs)))

            pending = queue.Queue()
            stop = threading.Event()

            def producer():
                for idxs in batches:
                    if stop.is_set():
                        return
                    while pending.qsize() >= self.prefetch and not stop.is_set():
                        stop.wait(0.005)
                    pending.put(load_batch(idxs))
                pending.put(None)

            t = threading.Thread(target=producer, daemon=True)
            t.start()
            try:
                while True:
                    batch = pending.get()
                    if batch is None:
                        return
                    yield batch
            finally:
                stop.set()
