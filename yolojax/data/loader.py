"""Background-thread batch loader with device prefetch (SURVEY.md §2.4, §7
"Host input pipeline throughput").

The reference uses forked DataLoader workers; here decode parallelism comes
from a thread pool (cv2's JPEG decode releases the GIL) and batches are
assembled ahead of consumption into a bounded queue, so host IO overlaps
device compute.  ``prefetch_to_device`` keeps one batch in flight on the
accelerator (double buffering against HBM).

Multi-scale note: the loader yields *size-agnostic* host batches (fixed
canvas); the train loop picks the bucketed output size and calls the fused
augment graph — so one epoch mixes resolutions without touching the loader.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import jax
import numpy as np

from .dataset import collate

__all__ = ["Loader", "overlap_device_puts", "prefetch_to_device"]


class Loader:
    """Iterates shuffled, collated host batches forever (or one epoch)."""

    def __init__(self, dataset, batch_size: int, *, workers: int = 3, seed: int = 0,
                 shuffle: bool = True, drop_last: bool = True, depth: int = 3,
                 shard: tuple[int, int] = (0, 1)):
        """``shard=(process_index, process_count)`` splits each epoch across
        hosts for multi-host pods (every process feeds its local devices over
        DCN while the sharded step reduces over ICI — SURVEY.md §2.17); the
        shuffle is seed-synchronized so shards are disjoint and exhaustive.
        """
        self.dataset = dataset
        self.batch_size = batch_size
        self.workers = max(1, workers)
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.depth = depth
        self.shard = shard
        self.rng = np.random.default_rng(seed)

    def _epoch_order(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)
        index, count = self.shard
        return order[index::count] if count > 1 else order

    def _batches(self, order):
        b = self.batch_size
        end = len(order) - (len(order) % b if self.drop_last else 0)
        for i in range(0, end, b):
            yield order[i:i + b]

    def epoch(self):
        """One pass over the dataset as collated numpy batches."""
        stop = object()
        q: queue.Queue = queue.Queue(maxsize=self.depth)

        def produce():
            try:
                with ThreadPoolExecutor(self.workers) as pool:
                    for idxs in self._batches(self._epoch_order()):
                        items = list(pool.map(self.dataset.load, idxs))
                        q.put(collate(items))
                q.put(stop)
            except BaseException as exc:  # surface worker failures to the consumer
                q.put(exc)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            if isinstance(item, BaseException):
                # re-raise in the consuming thread: a bad record must fail the
                # epoch loudly, not silently truncate eval / busy-loop train
                raise item
            yield item

    def __iter__(self):
        while True:
            yield from self.epoch()


def prefetch_to_device(iterator, size: int = 2):
    """Keep ``size`` batches in flight on the default device."""
    buf = []
    for batch in iterator:
        buf.append(jax.device_put(batch))
        if len(buf) == size:
            yield buf.pop(0)
    yield from buf


def overlap_device_puts(iterator, put, depth: int = 2):
    """Issue host→device puts for UPCOMING batches on a background thread
    (SURVEY.md §7 "overlap with compute via prefetch; double-buffer").

    Dispatching the put from the consumer thread serializes the wire send
    with the device step it precedes: single-process ``shard_host_batch`` is
    a no-op, so jit ships the host numpy synchronously at dispatch, and an
    explicit ``device_put`` can itself block on the send (through the axon
    tunnel it does).  Issued from a side thread, batch k+1's transfer rides
    while step k computes — the pipelined batch period approaches
    max(transfer, step) instead of their sum.

    ``put`` maps one host batch to (sharded) device arrays; ``depth`` bounds
    in-flight device batches (2 = classic double buffering).  Exceptions
    from the source or the put re-raise at the consumer, same contract as
    :meth:`Loader.epoch`.
    """
    stop = object()
    q: queue.Queue = queue.Queue(maxsize=depth)

    def produce():
        try:
            for batch in iterator:
                q.put(put(batch))
            q.put(stop)
        except BaseException as exc:
            q.put(exc)

    threading.Thread(target=produce, daemon=True).start()
    while True:
        item = q.get()
        if item is stop:
            return
        if isinstance(item, BaseException):
            raise item
        yield item
