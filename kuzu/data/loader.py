"""Deterministic host-side data loading: Dataset protocol + threaded loader.

Replacement for the reference's torch ``DataLoader``/``InfiniteDataLoader``
stack (``yolov12/ultralytics/data/build.py:28-153``): seeded epoch shuffling,
drop-last batching for static shapes, thread-pool prefetch (TPU input is
host-bound numpy work; threads overlap it with device steps), and per-process
sharding for multi-host — each host loads ``1/process_count`` of every batch,
replacing ``DistributedSampler``.
"""

from __future__ import annotations

import threading
from queue import Queue
from typing import Any, Iterator, Protocol

import numpy as np


class Dataset(Protocol):
    def __len__(self) -> int: ...

    def __getitem__(self, idx: int) -> dict[str, np.ndarray]: ...


def next_bucket(n: int, min_bucket: int = 8) -> int:
    """Smallest bucket >= n from ``min_bucket * {1,2,3,4,6,8,12,...}``
    (the {2^j, 3*2^j} ladder — two buckets per octave).

    Host-facing batches pad to these static sizes so that repeat calls with
    varying counts reuse the compiled XLA program — a fresh batch dim is a
    fresh compile (and through the tunneled TPU, a multi-second stall).
    Pure powers of two wasted up to ~50% of the batch as padding at the
    production column counts (334 crops -> 512); the 1.5x intermediate
    cuts worst-case padding to ~33% for one extra compile per octave.
    Below 12 the ladder stays pure powers of two (padding there is cheap
    and fewer rungs = fewer compiles). Every bucket stays a multiple of
    ``min_bucket`` (dp divisibility)."""
    k = 1
    while k * min_bucket < n:
        if k & (k - 1) == 0:  # power of two -> 1.5x (2 -> 3, 4 -> 6, ...)
            nk = 2 if k == 1 else k * 3 // 2
            if nk * min_bucket < 12:
                nk = k * 2
        else:  # 3*2^j -> the next power of two
            nk = k * 4 // 3
        k = nk
    return k * min_bucket


def default_collate(samples: list[dict[str, np.ndarray]]) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    for key in samples[0]:
        out[key] = np.stack([s[key] for s in samples])
    return out


class DataLoader:
    """Seeded, static-shape batch iterator with background prefetch."""

    def __init__(
        self,
        dataset: Dataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = True,
        pad_last: bool = False,
        collate_fn: Any = None,
        num_workers: int = 4,
        prefetch: int = 2,
        group_fn: Any = None,
    ):
        """``pad_last``: instead of dropping/shrinking the final partial
        batch, repeat samples up to ``batch_size`` and emit a ``sample_mask``
        (1.0 for real rows) — keeps every batch shardable and shape-static."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last and not pad_last
        self.pad_last = pad_last
        self.collate = collate_fn or default_collate
        import os

        # clamp to the host's cores: worker threads beyond them only add
        # GIL/scheduler contention (measured on a 1-core host: hot-cache
        # 53.8 img/s at workers=0 vs 44.9 at workers=2; the old default of
        # 4 workers HALVED throughput there)
        self.num_workers = min(max(num_workers, 0), os.cpu_count() or 1)
        self.prefetch = prefetch
        if self.num_workers > 0:
            # cv2's internal per-call thread pool fights the loader's worker
            # threads (measured: 8 workers gave 25 -> 27 img/s at flagship
            # scale). Single-threaded cv2 calls let workers parallelize
            # ACROSS samples instead (reference does the same,
            # ultralytics/data/build.py cv2.setNumThreads(0)).
            try:
                import cv2

                cv2.setNumThreads(0)
            except ImportError:
                pass
        # group_fn(idx) -> hashable key: batches draw only within a group
        # (rect/aspect-grouped batching — reference rect mode, data/base.py).
        # Keeps every batch shape-static per group so XLA compiles once per
        # distinct shape bucket.
        self.group_fn = group_fn
        self.epoch = 0
        # multi-host: every process sees the same global index order (same
        # seed) and loads only its 1/process_count slice of each batch —
        # the DistributedSampler replacement. Single-process: no-op.
        import jax

        self.process_index = jax.process_index()
        self.process_count = jax.process_count()
        if batch_size % self.process_count != 0:
            raise ValueError(
                f"global batch {batch_size} must divide by process count "
                f"{self.process_count}"
            )
        self.local_batch = batch_size // self.process_count

    def __len__(self) -> int:
        if self.group_fn is not None:
            sizes = [len(g) for g in self._groups().values()]
            if self.drop_last:
                return sum(n // self.batch_size for n in sizes)
            return sum(-(-n // self.batch_size) for n in sizes)
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _groups(self) -> dict:
        cached = getattr(self, "_group_cache", None)
        if cached is None:
            groups: dict = {}
            for i in range(len(self.dataset)):
                groups.setdefault(self.group_fn(i), []).append(i)
            cached = self._group_cache = groups
        return cached

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)  # per-epoch augmentation seeds

    def _index_order(self) -> np.ndarray:
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            return rng.permutation(n)
        return np.arange(n)

    def _batches(self) -> Iterator[tuple[np.ndarray, int]]:
        if self.group_fn is not None:
            yield from self._grouped_batches()
            return
        order = self._index_order()
        n_batches = len(self)
        for b in range(n_batches):
            idxs = order[b * self.batch_size : (b + 1) * self.batch_size]
            yield self._shard(idxs)

    def _grouped_batches(self) -> Iterator[tuple[np.ndarray, int]]:
        """Batches drawn within shape groups; batch order shuffled across
        groups so training still mixes buckets."""
        rng = np.random.default_rng(self.seed + self.epoch)
        batches: list[np.ndarray] = []
        for key in sorted(self._groups(), key=str):
            idxs_g = np.asarray(self._groups()[key])
            if self.shuffle:
                idxs_g = idxs_g[rng.permutation(len(idxs_g))]
            n_full = (
                len(idxs_g) // self.batch_size
                if self.drop_last
                else -(-len(idxs_g) // self.batch_size)
            )
            for b in range(n_full):
                batches.append(idxs_g[b * self.batch_size : (b + 1) * self.batch_size])
        if self.shuffle:
            batches = [batches[i] for i in rng.permutation(len(batches))]
        for idxs in batches:
            yield self._shard(idxs)

    def _shard(self, idxs: np.ndarray) -> tuple[np.ndarray, int]:
        n_real = len(idxs)
        if self.pad_last and n_real < self.batch_size:
            pad = np.resize(idxs, self.batch_size - n_real)
            idxs = np.concatenate([idxs, pad])
        if self.process_count > 1:
            lo = self.process_index * self.local_batch
            hi = lo + self.local_batch
            n_real = int(np.clip(n_real - lo, 0, self.local_batch))
            idxs = idxs[lo:hi]
        return idxs, n_real

    def _finish(self, samples: list, n_real: int) -> dict[str, np.ndarray]:
        batch = self.collate(samples)
        if self.pad_last:
            mask = np.zeros((len(samples),), np.float32)
            mask[:n_real] = 1.0
            batch["sample_mask"] = mask
        return batch

    def __iter__(self) -> Iterator[dict[str, np.ndarray]]:
        if self.num_workers == 0:
            for idxs, n_real in self._batches():
                yield self._finish([self.dataset[int(i)] for i in idxs], n_real)
            return

        q: Queue = Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce() -> None:
            try:
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(self.num_workers) as pool:
                    for idxs, n_real in self._batches():
                        if stop.is_set():
                            return
                        samples = list(pool.map(self.dataset.__getitem__, map(int, idxs)))
                        q.put(self._finish(samples, n_real))
            except BaseException as e:  # surface worker errors to the consumer
                q.put(e)
                return
            q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
