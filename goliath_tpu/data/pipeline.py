"""Host-side data pipeline: threaded prefetch feeding device arrays.

Replaces the reference's torch DataLoader workers (SURVEY.md 2.8): decode
happens on host threads while the device runs the previous step; a small
queue keeps the TPU fed.
"""

from __future__ import annotations

import logging
import queue
import threading
from typing import Any, Callable, Dict, Iterable, Iterator, List, Optional

import numpy as np

logger = logging.getLogger(__name__)


def collate(samples: List[Optional[Dict[str, Any]]]) -> Optional[Dict[str, Any]]:
    """default_collate that drops None samples (reference dataloader.py:752-756)."""
    samples = [s for s in samples if s is not None]
    if not samples:
        return None
    batch: Dict[str, Any] = {}
    for k in samples[0]:
        vals = [s[k] for s in samples]
        if isinstance(vals[0], (str, bytes)):
            batch[k] = vals
        else:
            batch[k] = np.stack([np.asarray(v) for v in vals])
    return batch


class DataLoader:
    """Minimal map-style loader: dataset[i] -> sample dict, threaded prefetch."""

    def __init__(self, dataset, batch_size: int = 1, shuffle: bool = False,
                 num_workers: int = 1, seed: int = 0, drop_last: bool = True,
                 prefetch: int = 2, n_epochs: Optional[int] = None,
                 cache_device: bool = False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(num_workers, 0)
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.n_epochs = n_epochs  # None = loop forever
        # cache_device: upload the WHOLE dataset to the device once and
        # assemble batches with on-device gathers (host->device traffic per
        # step = just the index vector). For small fixture datasets on a
        # remote-tunnel device (axon), per-step host batch upload dominates
        # the step (~10 MB/step over a slow link); this removes it.
        self.cache_device = cache_device
        self._device_cache: Optional[Dict[str, Any]] = None

    def _index_stream(self) -> Iterator[List[int]]:
        rng = np.random.RandomState(self.seed)
        epoch = 0
        n = len(self.dataset)
        while self.n_epochs is None or epoch < self.n_epochs:
            order = rng.permutation(n) if self.shuffle else np.arange(n)
            for i in range(0, n - (self.batch_size - 1 if self.drop_last else 0),
                           self.batch_size):
                yield [int(j) for j in order[i: i + self.batch_size]]
            epoch += 1

    def _ensure_device_cache(self) -> Dict[str, Any]:
        if self._device_cache is None:
            import jax.numpy as jnp

            items = [self.dataset[i] for i in range(len(self.dataset))]
            cache: Dict[str, Any] = {}
            for k in items[0]:
                v0 = items[0][k]
                if isinstance(v0, (str, bytes)):
                    continue  # non-array fields are dropped in device mode
                cache[k] = jnp.asarray(
                    np.stack([np.asarray(it[k]) for it in items]))
            self._device_cache = cache
            logger.info(
                "DataLoader: cached %d samples on device (%d keys)",
                len(items), len(cache))
        return self._device_cache

    def __iter__(self) -> Iterator[Optional[Dict[str, Any]]]:
        if self.cache_device:
            cache = self._ensure_device_cache()
            for idxs in self._index_stream():
                ji = np.asarray(idxs)
                yield {k: v[ji] for k, v in cache.items()}
            return
        if self.num_workers == 0:
            for idxs in self._index_stream():
                yield collate([self.dataset[j] for j in idxs])
            return

        # samples are built on a thread pool: the heavy work (native zip
        # inflate, avif/png decode) runs outside the GIL, so threads scale
        # like the reference's DataLoader worker processes without pickling
        from concurrent.futures import ThreadPoolExecutor

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        ex = ThreadPoolExecutor(max_workers=self.num_workers)

        def producer():
            try:
                for idxs in self._index_stream():
                    if stop.is_set():
                        return
                    q.put([ex.submit(self.dataset.__getitem__, j)
                           for j in idxs])
            finally:
                q.put(StopIteration)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is StopIteration:
                    return
                yield collate([f.result() for f in item])
        finally:
            stop.set()
            ex.shutdown(wait=False, cancel_futures=True)
