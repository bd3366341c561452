"""Threaded prefetching data loader.

Replaces torch.utils.data.DataLoader (main.py:813-821) without torch: worker
threads run the PIL/numpy pipelines (which release the GIL in PIL's C code),
a bounded queue overlaps host preprocessing with device steps, and batches
come out as contiguous NHWC numpy ready for jax.device_put. A C++ fast path
for label decode/remap plugs in via data._native when built.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Sequence

import numpy as np


_WORKER_DATASET = None


def _proc_init(dataset):
    global _WORKER_DATASET
    _WORKER_DATASET = dataset


def collate(samples):
    """Stack a batch, preserving the uint8 wire format (ToArray): integer
    batches cross host->device as-is and the jitted step casts on device —
    bit-identical to a float32 wire at 4x fewer transferred bytes."""
    imgs = np.stack([s["image"] for s in samples])
    if imgs.dtype != np.uint8:
        imgs = imgs.astype(np.float32)
    lbls = np.stack([s["label"] for s in samples])
    if lbls.dtype != np.uint8:
        lbls = lbls.astype(np.int32)
    return {"image": imgs, "label": lbls}


def _proc_load(idxs):
    samples = [_WORKER_DATASET[int(i)] for i in idxs]
    return collate(samples)


class DataLoader:
    """Minimal torch-free loader: shuffle, batch, drop_last, prefetch.

    worker_mode 'thread' (default; PIL's C paths release the GIL) or
    'process' (spawned pool — full parallelism for numpy-heavy pipelines;
    workers import only data modules, never jax, so they stay lightweight).
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 num_workers: int = 4, drop_last: bool = True,
                 prefetch: int = 4, seed: int = 0,
                 worker_mode: str = "thread",
                 shard_rank: int = 0, shard_count: int = 1):
        """``batch_size`` is PER PROCESS; with ``shard_count`` > 1 every
        process draws the same global shuffle (seed+epoch) and takes its
        disjoint ``shard_rank`` slice of each global batch — the data-side
        half of multi-host DP (the reference uses DistributedSampler,
        main.py:818)."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.seed = seed
        self.worker_mode = worker_mode
        self.shard_rank = shard_rank
        self.shard_count = max(1, shard_count)
        self._epoch = 0
        self._pool = None

    def set_epoch(self, epoch: int):
        """Pin the shuffle epoch (resume support: replay the same index
        order a fresh run would have used at this epoch). Also forwarded to
        the dataset so per-sample augmentation RNG advances with epochs."""
        self._epoch = epoch
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)

    def _get_pool(self):
        if self._pool is None:
            import multiprocessing as mp
            ctx = mp.get_context("spawn")
            self._pool = ctx.Pool(self.num_workers, initializer=_proc_init,
                                  initargs=(self.dataset,))
        return self._pool

    def close(self):
        if self._pool is not None:
            self._pool.terminate()
            self._pool = None

    def __len__(self):
        n = len(self.dataset)
        gbs = self.batch_size * self.shard_count
        return n // gbs if self.drop_last else (n + gbs - 1) // gbs

    def _index_batches(self) -> Sequence[Sequence[int]]:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            np.random.default_rng(self.seed + self._epoch).shuffle(idx)
        gbs = self.batch_size * self.shard_count
        lo = self.shard_rank * self.batch_size
        return [idx[i * gbs + lo:i * gbs + lo + self.batch_size]
                for i in range(len(self))]

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        if self.worker_mode == "process":
            yield from self._iter_process()
            return
        batches = self._index_batches()
        self._epoch += 1
        task_q: "queue.Queue" = queue.Queue()
        results: Dict[int, Dict[str, np.ndarray]] = {}
        lock = threading.Lock()
        stop = threading.Event()
        # Backpressure: a worker may only start a batch after acquiring a
        # slot; the consumer releases one per batch it takes. Buffered +
        # in-flight batches are bounded by `bound` (~150 MB/batch at bs16
        # 768^2 — unbounded production can OOM the host on a slow step).
        bound = max(self.prefetch, self.num_workers)
        slots = threading.Semaphore(bound)
        self._peak_buffered = 0

        for bi, b in enumerate(batches):
            task_q.put((bi, b))

        def worker():
            # INVARIANT: a worker holds a SLOT before it takes a TASK.
            # The reverse order deadlocks (observed live 2026-08-19, via
            # the SIGUSR1 stack dump): the worker holding the next batch
            # the consumer needs can lose every slot race to workers
            # holding LATER batches — semaphores are not fair — and once
            # `results` holds `bound` batches none of which is the needed
            # one, the consumer never pops, no slot is ever released, and
            # every thread waits forever. Slot-first makes that state
            # unreachable: any taken task owns a slot, so it completes
            # and the in-order consumer always makes progress.
            while not stop.is_set():
                while not slots.acquire(timeout=0.05):
                    if stop.is_set():
                        return
                try:
                    bi, b = task_q.get_nowait()
                except queue.Empty:
                    slots.release()
                    return
                try:
                    batch = collate([self.dataset[int(i)] for i in b])
                except Exception as exc:  # surface worker errors to consumer
                    batch = exc
                with lock:
                    results[bi] = batch
                    self._peak_buffered = max(self._peak_buffered,
                                              len(results))

        threads = [threading.Thread(target=worker, daemon=True)
                   for _ in range(self.num_workers)]
        for t in threads:
            t.start()

        try:
            for bi in range(len(batches)):
                while True:
                    with lock:
                        if bi in results:
                            batch = results.pop(bi)
                            break
                    threading.Event().wait(0.002)
                slots.release()
                if isinstance(batch, Exception):
                    raise batch
                yield batch
        finally:
            stop.set()


    def _iter_process(self) -> Iterator[Dict[str, np.ndarray]]:
        batches = self._index_batches()
        self._epoch += 1
        pool = self._get_pool()
        pending = []
        for b in batches:
            pending.append(pool.apply_async(_proc_load, (list(map(int, b)),)))
            while len(pending) > self.prefetch:
                yield pending.pop(0).get()
        for r in pending:
            yield r.get()


def prefetch_to_device(iterator, mesh=None, size: int = 2):
    """Overlap host->device transfer with compute: device_put ``size``
    batches ahead (sharded over the mesh data axis when given)."""
    import jax
    from mrfp_tpu.core.mesh import shard_batch

    buf = []
    for batch in iterator:
        if mesh is not None:
            batch = shard_batch(mesh, batch)
        else:
            batch = jax.tree_util.tree_map(jax.device_put, batch)
        buf.append(batch)
        if len(buf) >= size:
            yield buf.pop(0)
    while buf:
        yield buf.pop(0)
