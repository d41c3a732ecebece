"""Background sample pipeline — the reference's DataLoader worker pool.

Parity: train.py:118-122 wraps every dataset in a torch DataLoader with 8
worker *processes* doing JPEG decode + LANCZOS resize on CPU (SURVEY.md §3.1
hot loop 3). Here the heavy decode runs inside the native C++ batch call
(wildmvs/cpp/image.cpp) which releases the GIL and runs its own thread pool,
so plain Python *threads* scale like the reference's processes without any
pickling/IPC cost, and sample order stays deterministic (in-order delivery —
the reference relies on DataLoader's same guarantee for the occ_masking
identical-batch invariant).
"""
from __future__ import annotations

from collections import deque
from concurrent.futures import ThreadPoolExecutor


def iterate(dataset, indices, num_workers: int = 4, prefetch_depth: int = 8):
    """Yield dataset[i] for i in indices, computed by a background thread
    pool with up to `prefetch_depth` samples in flight, delivered in order.

    num_workers <= 0 degrades to plain synchronous iteration (the
    --num_workers 0 escape hatch, same as torch DataLoader's).
    """
    if num_workers <= 0:
        for i in indices:
            yield dataset[int(i)]
        return
    prefetch_depth = max(prefetch_depth, num_workers)
    it = iter(indices)
    with ThreadPoolExecutor(max_workers=num_workers) as pool:
        futures = deque()
        try:
            for _ in range(prefetch_depth):
                i = next(it, None)
                if i is None:
                    break
                futures.append(pool.submit(dataset.__getitem__, int(i)))
            while futures:
                sample = futures.popleft().result()
                i = next(it, None)
                if i is not None:
                    futures.append(pool.submit(dataset.__getitem__, int(i)))
                yield sample
        finally:
            for f in futures:
                f.cancel()


def iterate_batches(dataset, order, batch_size: int, collate,
                    num_workers: int = 4, prefetch_depth: int = 8):
    """Batched variant: yields collate([...]) of consecutive index groups,
    INCLUDING a final partial batch — the reference's DataLoader defaults to
    drop_last=False (train.py:120-122), so tail samples are never skipped
    (the jitted step recompiles once for the tail size)."""
    samples = iterate(dataset, order, num_workers=num_workers,
                      prefetch_depth=max(prefetch_depth, batch_size))
    buf = []
    for s in samples:
        buf.append(s)
        if len(buf) == batch_size:
            yield collate(buf)
            buf = []
    if buf:
        yield collate(buf)
