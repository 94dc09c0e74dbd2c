"""Host pipeline prefetch: overlap batch preparation with device steps.

The jitted train step consumes a batch every few milliseconds; any host work
done synchronously in the dispatch loop (file parse, collate, the
``data.presort`` id preprocessing) serializes with it.  This module maps a
transform over a batch iterator with a small thread pool, a bounded
look-ahead, and strictly in-order yields — so host work for batch ``i+k``
runs while the device executes batch ``i``, and determinism (batch order,
RNG-free transforms) is preserved.

Threads, not processes: the hot transforms release the GIL (numpy slicing,
the C++ presort/parse via ctypes), so threads overlap for real without the
serialization cost of pickling multi-MB batches through a process pipe.

Reference analogue: ``torch.utils.data.DataLoader(num_workers=...)``'s
worker-overlapped loading (the reference relies on it implicitly —
``/root/reference/torecsys/data/dataloader/collate_fn.py:18`` is designed as
its ``collate_fn``); this is the same overlap, re-built for a GIL-releasing
host pipeline.
"""

from __future__ import annotations

import collections
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterable, Iterator, Optional


def prefetch_map(
    src: Iterable,
    transform: Optional[Callable] = None,
    num_workers: int = 2,
    depth: int = 4,
) -> Iterator:
    """Yield ``transform(item)`` for each item of ``src``, in order, with up
    to ``depth`` items in flight across ``num_workers`` threads.

    ``transform=None`` still decouples producer from consumer (useful when
    ``src`` itself does blocking IO per item).  Exceptions from ``src`` or
    ``transform`` propagate at the corresponding yield point; the pool shuts
    down cleanly when the consumer stops early (generator close).
    """
    if num_workers <= 0 or depth <= 0:
        it = iter(src)
        if transform is None:
            yield from it
        else:
            for item in it:
                yield transform(item)
        return

    fn = transform if transform is not None else (lambda x: x)
    it = iter(src)
    pending = collections.deque()
    # no `with` block: a consumer that stops early (break / interpreter
    # shutdown) closes this generator, and ThreadPoolExecutor.__exit__'s
    # blocking join raises noisy teardown errors at interpreter exit —
    # shut down non-blocking with futures cancelled instead.
    pool = ThreadPoolExecutor(max_workers=num_workers)
    try:
        for item in it:
            pending.append(pool.submit(fn, item))
            if len(pending) >= depth:
                yield pending.popleft().result()
        while pending:
            yield pending.popleft().result()
        pool.shutdown(wait=True)
    finally:
        try:
            pool.shutdown(wait=False, cancel_futures=True)
        except Exception:
            pass  # interpreter teardown: threading internals may be gone


class Prefetcher:
    """Re-iterable wrapper: a fresh :func:`prefetch_map` run per epoch.

    Accepts the same loader protocol as :meth:`Trainer.fit` (re-iterable
    container or zero-arg callable returning an iterator).
    """

    def __init__(self, loader, transform=None, num_workers: int = 2,
                 depth: int = 4):
        self.loader = loader
        self.transform = transform
        self.num_workers = num_workers
        self.depth = depth

    def __iter__(self):
        src = self.loader() if callable(self.loader) else self.loader
        return prefetch_map(src, self.transform, self.num_workers, self.depth)


__all__ = ["Prefetcher", "prefetch_map"]
