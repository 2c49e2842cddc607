"""Prefetching sample loader: overlap host IO with device aggregation.

The reference's extraction is strictly serial: unpickle -> prep -> GPU
update, one sample at a time (``extract_coma.py:383-425``). Here a
background thread pool loads + preps samples into fixed-size batches while
the TPU aggregates the previous batch — the device never waits on the
filesystem for long sample streams.
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Iterator, List, Optional, Sequence

import numpy as np


class PrefetchingSampleLoader:
    """Iterate fixed-size batches of prepped samples with background IO.

    ``prepare_fn(item) -> Optional[dict of arrays]`` runs on worker threads
    (pickle+numpy releases the GIL enough for real overlap); None results
    (e.g. scale-filtered samples) are dropped. The last batch is padded and
    carries a ``valid`` mask.
    """

    def __init__(
        self,
        items: Sequence,
        prepare_fn: Callable,
        batch_size: int,
        num_workers: int = 4,
        prefetch_batches: int = 2,
    ):
        self.items = list(items)
        self.prepare_fn = prepare_fn
        self.batch_size = batch_size
        self.num_workers = max(1, num_workers)
        self.queue: "queue.Queue" = queue.Queue(maxsize=prefetch_batches)
        self._error: Optional[BaseException] = None

    def _producer(self):
        from concurrent.futures import ThreadPoolExecutor

        try:
            buf: List[Dict[str, np.ndarray]] = []
            with ThreadPoolExecutor(self.num_workers) as pool:
                for prepped in pool.map(self.prepare_fn, self.items):
                    if prepped is None:
                        continue
                    buf.append(prepped)
                    if len(buf) == self.batch_size:
                        self.queue.put(self._stack(buf, full=True))
                        buf = []
            if buf:
                self.queue.put(self._stack(buf, full=False))
        except BaseException as e:  # surface worker errors to the consumer
            self._error = e
        finally:
            self.queue.put(None)

    def _stack(self, samples: List[Dict[str, np.ndarray]], full: bool):
        keys = samples[0].keys()
        n = len(samples)
        pad = self.batch_size - n
        batch = {}
        for k in keys:
            arr = np.stack([s[k] for s in samples])
            if pad:
                arr = np.concatenate([arr, np.repeat(arr[-1:], pad, axis=0)])
            batch[k] = arr
        batch["valid"] = np.concatenate(
            [np.ones(n, np.float32), np.zeros(pad, np.float32)]
        )
        return batch

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        thread = threading.Thread(target=self._producer, daemon=True)
        thread.start()
        while True:
            batch = self.queue.get()
            if batch is None:
                break
            yield batch
        thread.join()
        if self._error is not None:
            raise self._error
