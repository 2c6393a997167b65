"""Host->device prefetching for streamed input pipelines.

TPU-native analog of the reference's (unused) CUDA-stream ``GPUPrefetcher``
(``scripts/testing.py:283-327``): JAX transfers are already asynchronous, so
the prefetcher simply keeps ``buffer_size`` batches in flight — while the
device executes step N, the host is decoding and transferring batch N+1.
Used by the wav2vec raw-waveform loop; the log-mel trainer doesn't need it
(its entire dataset is device-resident).
"""

from __future__ import annotations

import collections
import threading
from typing import Callable, Iterable, Iterator

import jax


def device_prefetch(iterator: Iterable, buffer_size: int = 2,
                    sharding=None) -> Iterator:
    """Wrap a host batch iterator; yields device-resident pytrees while the
    next transfers overlap with compute."""
    queue = collections.deque()

    def put(batch):
        if sharding is not None:
            queue.append(jax.tree.map(
                lambda x: jax.device_put(x, sharding), batch))
        else:
            queue.append(jax.tree.map(jax.device_put, batch))

    it = iter(iterator)
    try:
        for _ in range(buffer_size):
            put(next(it))
    except StopIteration:
        pass
    while queue:
        out = queue.popleft()
        try:
            put(next(it))
        except StopIteration:
            pass
        yield out


class BackgroundLoader:
    """Run a host-side batch producer on a worker thread (decode overlap).

    The reference parallelized decoding with 8 DataLoader worker processes
    (configs/config.yaml:22-26); here one background thread suffices because
    decode is native C++ releasing the GIL in I/O, and the device path is
    asynchronous.
    """

    def __init__(self, producer: Callable[[], Iterable], capacity: int = 4):
        self._producer = producer
        self._capacity = capacity

    def __iter__(self):
        queue: collections.deque = collections.deque()
        done = threading.Event()
        lock = threading.Condition()

        def work():
            for item in self._producer():
                with lock:
                    while len(queue) >= self._capacity and not done.is_set():
                        lock.wait(0.1)
                    if done.is_set():
                        return
                    queue.append(item)
                    lock.notify_all()
            done.set()
            with lock:
                lock.notify_all()

        t = threading.Thread(target=work, daemon=True)
        t.start()
        try:
            while True:
                with lock:
                    while not queue and not done.is_set():
                        lock.wait(0.1)
                    if queue:
                        item = queue.popleft()
                        lock.notify_all()
                    elif done.is_set():
                        return

                yield item
        finally:
            done.set()
            with lock:
                lock.notify_all()
