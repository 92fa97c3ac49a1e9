"""Host-side batching data loader.

Replaces torch's DataLoader for this framework: shuffled epoch order, numpy
collation to fixed-shape batches, and background workers that keep a small
prefetch queue full so augmentation/warping overlaps device compute (the
analog of the reference's torch DataLoader worker processes, train.py:74).

Two worker modes:

* ``use_processes=True`` (default for ``num_workers > 1``): forkserver
  worker processes, each decoding/warping full samples independently --
  sample assembly is Python+numpy-heavy and measured 6x SLOWER under a
  thread pool at 544x960 (GIL + cv2 internal-thread thrash).  Forkserver
  rather than fork or spawn: forking the jax-initialized parent put every
  worker through a ~45 s huge-page allocation storm (inherited
  MADV_HUGEPAGE arenas), and spawn re-imports ``__main__`` (the training
  entry point -> jax, ~15 s/worker serialized on small hosts).  The
  forkserver is preloaded with THIS module only -- numpy + cv2, no jax
  (the package ``__init__`` is deliberately jax-free) -- so workers fork
  from a ~100 MB clean template in milliseconds.  Workers receive the
  dataset by pickle once at pool start (GenericDataset drops its
  decoded-frame cache in ``__getstate__``) and return collated numpy
  batches.
* ``use_processes=False``: the round-1 thread pool (cv2 pinned to one
  internal thread per worker); fine at smoke scale and on platforms
  without multiprocessing.
"""

from __future__ import annotations

import os
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List, Optional

import numpy as np

_WORKER_DATASET = None


def _worker_init(dataset):
    import random

    import cv2

    global _WORKER_DATASET
    _WORKER_DATASET = dataset
    cv2.setNumThreads(1)          # one decode pipeline per worker process
    # decorrelate augmentation streams across workers (torch DataLoader
    # does the same via worker seeds)
    seed = (os.getpid() * 2654435761) % (2 ** 31)
    np.random.seed(seed)
    random.seed(seed)
    if hasattr(dataset, "_data_rng"):
        dataset._data_rng = np.random.RandomState(seed ^ 0x5EED)


def _worker_load(idxs):
    if os.environ.get("DEFT_LOADER_DEBUG"):
        import sys
        import time

        t0 = time.time()
        samples = [_WORKER_DATASET[i] for i in idxs]
        t1 = time.time()
        out = collate(samples)
        sys.stderr.write(
            f"[loader worker {os.getpid()}] {len(idxs)} samples "
            f"{t1 - t0:.1f}s collate {time.time() - t1:.1f}s\n")
        sys.stderr.flush()
        return out
    return collate([_WORKER_DATASET[i] for i in idxs])


def collate(samples: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    keys = samples[0].keys()
    return {k: np.stack([s[k] for s in samples]) for k in keys}


class DataLoader:
    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 num_workers: int = 4, drop_last: bool = True,
                 prefetch: int = 4, seed: int = 0,
                 use_processes: Optional[bool] = None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.rng = np.random.RandomState(seed)
        if use_processes is None:
            # Worker processes only pay off with real cores: each batch rides
            # the result pipe as a ~600 MB pickle (measured ~115 MB/s), which
            # on a 1-2 core host serializes against the workers themselves
            # and LOSES to in-process assembly.
            use_processes = self.num_workers > 1 and (os.cpu_count() or 1) > 2
        self.use_processes = use_processes and self.num_workers > 1
        self._pool = None

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

    def _process_pool(self):
        """Lazy spawn pool, reused across epochs (workers pay the package
        import + dataset unpickle once at pool start)."""
        if self._pool is None:
            import multiprocessing as mp

            ctx = mp.get_context("forkserver")
            # fork from a template that imported only this module (numpy +
            # cv2), not __main__ / jax -- see the module docstring
            ctx.set_forkserver_preload([__name__, "cv2"])
            self._pool = ctx.Pool(self.num_workers, initializer=_worker_init,
                                  initargs=(self.dataset,))
        return self._pool

    def close(self):
        if self._pool is not None:
            self._pool.terminate()
            self._pool = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        batches = self._batches()
        if self.num_workers <= 1:
            for idxs in batches:
                yield collate([self.dataset[i] for i in idxs])
            return

        if self.use_processes:
            pool = self._process_pool()
            # imap with bounded lookahead: the pool runs ahead of the
            # consumer by `prefetch` batches, each worker building whole
            # batches independently (no GIL, no cv2 thread thrash)
            for batch in pool.imap(_worker_load, batches, chunksize=1):
                yield batch
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
