"""Host→device prefetch: overlap batch preparation and transfer with the
device step (the reference achieves this with PostMergeBatchLoader's
collector threads + MXNet's async engine; in JAX we pipeline device_put)."""
from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator


def threaded_prefetch(iterator: Iterator, depth: int = 2) -> Iterator:
    """Run the source iterator in a background thread, `depth` items ahead."""
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    END = object()

    def worker():
        try:
            for item in iterator:
                q.put(item)
        except Exception as e:  # surface in the consumer
            q.put(e)
        finally:
            q.put(END)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if item is END:
            return
        if isinstance(item, Exception):
            raise item
        yield item


def device_prefetch(
    iterator: Iterator, put: Callable, depth: int = 2
) -> Iterator:
    """Apply `put` (e.g. shard_batch) ahead of consumption so transfers
    overlap the previous step's execution."""
    import collections

    buf = collections.deque()
    for item in iterator:
        buf.append(put(item))
        if len(buf) >= depth:
            yield buf.popleft()
    while buf:
        yield buf.popleft()


def pool_map_prefetch(
    fn: Callable, args_iter, workers: int = 4, depth: int = 8
) -> Iterator:
    """Map ``fn`` over ``args_iter`` with a thread pool, yielding results in
    submission order ``depth`` ahead — the parallel analogue of the
    reference's N transform worker threads (utils/detection_input.py:147-156)
    for generator-bound streams (e.g. raytraced synthetic scenes)."""
    import collections
    from concurrent.futures import ThreadPoolExecutor

    ex = ThreadPoolExecutor(max_workers=workers)
    futs: "collections.deque" = collections.deque()
    try:
        for a in args_iter:
            futs.append(ex.submit(fn, a))
            if len(futs) >= depth:
                yield futs.popleft().result()
        while futs:
            yield futs.popleft().result()
    finally:
        ex.shutdown(wait=False, cancel_futures=True)
