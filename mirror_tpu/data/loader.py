"""Host-side batch loader.

Replaces torch DataLoader + DistributedSampler
(/root/reference/train_mirror.py:847-886) with a numpy loader designed for
SPMD input feeding:

- per-epoch deterministic shuffling (``set_epoch`` semantics of
  DistributedSampler);
- optional class-balanced weighted sampling with replacement
  (utils/loader.py:14-26 in the reference: weight proportional to
  1/class_count, num_samples = len(dataset));
- fixed-shape batches for XLA: train drops the trailing partial batch (all
  samples still seen across epochs thanks to reshuffling); eval pads the
  tail batch and marks padding in a ``valid`` mask so metrics stay exact;
- a background prefetch thread overlaps feature-file IO with device compute;
- multi-host sharding: with ``process_count > 1`` every process computes the
  SAME global epoch permutation from the shared seed, then loads only its
  block of each global batch (``batch_size`` stays the GLOBAL batch). The
  blocked layout makes the assembled global batch identical to the
  single-process batch — see parallel/distributed.py.
"""

import logging
import queue
import threading
from typing import Dict, Iterator, Optional

import numpy as np

from mirror_tpu.parallel.distributed import local_block

_logger = logging.getLogger(__name__)


def class_balanced_weights(dataset) -> np.ndarray:
    """Weight = 1/class_count, computed over the LIVE split with
    index-aligned labels. Deliberate fix vs the reference (PARITY.md): its
    sampler weights by full-cohort ``slide_cls_ids`` whose row positions
    index the merged survival table, not the dataset
    (ref datasets/dataset_survival.py:81-84,276-277 + utils/loader.py:14-26),
    so reference weights can be positionally misaligned with the fold."""
    labels = np.asarray([dataset.get_label(i) for i in range(len(dataset))])
    counts = np.bincount(labels)
    weights = 1.0 / counts[labels]
    return weights


class Loader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        pad_last: bool = False,
        weighted: bool = False,
        seed: int = 42,
        prefetch: int = 2,
        use_native: bool = True,
        native_threads: int = 8,
        process_index: int = None,
        process_count: int = None,
    ) -> None:
        if process_index is None or process_count is None:
            # default to the live JAX runtime (0/1 when not distributed) so
            # every call site shards per-host automatically under
            # jax.distributed (parallel/distributed.maybe_initialize)
            from mirror_tpu.parallel.distributed import process_info

            process_index, process_count = process_info(
                process_index, process_count
            )
        assert not (drop_last and pad_last)
        assert batch_size % process_count == 0, (batch_size, process_count)
        assert 0 <= process_index < process_count
        self.dataset = dataset
        self.batch_size = batch_size  # GLOBAL batch (all processes)
        self.process_index = process_index
        self.process_count = process_count
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.pad_last = pad_last
        self.weighted = weighted
        self.seed = seed
        self.epoch = 0
        self.prefetch = prefetch
        self.native_threads = native_threads
        self._weights = class_balanced_weights(dataset) if weighted else None
        self._weights_key = self._dataset_key() if weighted else None
        # C++ fast path: eligible when the cohort is .npy-backed and the
        # native library builds (see mirror_tpu/data/native_loader.py)
        self._native = False
        if use_native and len(dataset) and hasattr(dataset, "wsi_npy_path"):
            from . import native_loader

            self._native = (
                native_loader.available()
                and dataset.wsi_npy_path(0) is not None
            )

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _dataset_key(self):
        """Identity of the dataset's live index space: mode + fold + length.
        Length alone is not enough — two folds/splits can have equal sizes,
        which would silently reuse the other split's class weights."""
        return (
            getattr(self.dataset, "_mode", None),
            getattr(self.dataset, "fold_nb", None),
            len(self.dataset),
        )

    def _indices(self, rng: np.random.Generator) -> np.ndarray:
        n = len(self.dataset)
        if self.weighted:
            if self._weights is None or self._weights_key != self._dataset_key():
                # the shared dataset object may have switched fold/split
                # since construction (train_survival's eval_fn does) —
                # recompute so weights always match the live index space
                self._weights = class_balanced_weights(self.dataset)
                self._weights_key = self._dataset_key()
            p = self._weights / self._weights.sum()
            return rng.choice(n, size=n, replace=True, p=p)
        idx = np.arange(n)
        if self.shuffle:
            rng.shuffle(idx)
        return idx

    def _item(self, index: int, seed: int) -> Dict[str, np.ndarray]:
        # per-item randomness (token resampling) is a pure function of the
        # item's seed — drawn once per epoch at its GLOBAL batch position —
        # so multi-process loaders see exactly the single-process draws
        return self.dataset.__getitem__(
            index, rng=np.random.default_rng(seed)
        )

    def _make_batch(
        self, indices: np.ndarray, seeds: np.ndarray, valid: np.ndarray
    ) -> Dict[str, np.ndarray]:
        batch = self._make_batch_native(indices, seeds) if self._native else None
        if batch is None:  # numpy path (also the native-ineligible fallback)
            items = [
                self._item(int(i), int(s)) for i, s in zip(indices, seeds)
            ]
            batch = {k: np.stack([it[k] for it in items]) for k in items[0]}
        batch["valid"] = valid
        return batch

    def _make_batch_native(
        self, indices: np.ndarray, seeds: np.ndarray
    ) -> Optional[Dict[str, np.ndarray]]:
        """None = this cohort can't ride the C++ fast path (mixed formats,
        or .npy content the mmap gather rejects — float64, fortran order);
        the caller then assembles via numpy and the loader stays on the
        numpy path for the rest of the run instead of crashing the epoch."""
        from . import native_loader

        paths = []
        for i in indices:
            p = self.dataset.wsi_npy_path(int(i))
            if p is None:  # mixed-format cohort
                self._native = False
                return None
            paths.append(p)
        try:
            wsi = native_loader.gather_batch(
                paths, self.dataset.num_wsi_feature_tokens,
                [int(s) for s in seeds],
                num_threads=self.native_threads,
            )
        except (ValueError, RuntimeError) as e:
            _logger.warning(
                "native loader rejected this cohort (%s); falling back to "
                "the numpy path", e,
            )
            self._native = False
            return None
        metas = [self.dataset.get_meta(int(i)) for i in indices]
        batch = {k: np.stack([m[k] for m in metas]) for k in metas[0]}
        batch["wsi"] = wsi
        return batch

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        rng = np.random.default_rng(self.seed + self.epoch * 1000003)
        indices = self._indices(rng)
        n = len(indices)
        bs = self.batch_size
        stops = n - (n % bs) if self.drop_last else n
        # one resampling seed per GLOBAL epoch position — identical on every
        # process, independent of how many processes consume the epoch
        item_seeds = rng.integers(0, 2**63, size=n, dtype=np.int64)
        p, pc = self.process_index, self.process_count
        chunks = []
        for i in range(0, stops, bs):
            idx = indices[i : i + bs]
            seeds = item_seeds[i : i + bs]
            n_valid = len(idx)
            if n_valid < bs:
                if self.pad_last:
                    pad = bs - n_valid
                    idx = np.concatenate([idx, np.repeat(idx[-1:], pad)])
                    seeds = np.concatenate([seeds, np.repeat(seeds[-1:], pad)])
                elif pc > 1 and n_valid % pc:
                    raise ValueError(
                        "multi-process loader tail batch needs drop_last or "
                        f"pad_last ({n_valid} rows over {pc} processes)"
                    )
            valid = np.concatenate(
                [np.ones(n_valid, np.float32),
                 np.zeros(len(idx) - n_valid, np.float32)]
            )
            # blocked per-process slice: concatenating blocks in process
            # order == the global batch (single source of the layout rule)
            chunks.append(tuple(local_block(a, p, pc)
                                for a in (idx, seeds, valid)))

        if self.prefetch <= 0:
            for c in chunks:
                yield self._make_batch(*c)
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        error = []
        stop = threading.Event()  # set when the consumer abandons iteration

        def producer():
            try:
                for c in chunks:
                    batch = self._make_batch(*c)
                    while not stop.is_set():
                        try:
                            q.put(batch, timeout=0.1)
                            break
                        except queue.Full:
                            continue
                    if stop.is_set():
                        return
            except Exception as e:  # surface loader errors in the main thread
                error.append(e)
            finally:
                # the sentinel MUST reach the consumer or it blocks forever
                # on q.get() (the queue can be full of unconsumed batches at
                # normal completion); only give up once the consumer has
                # signalled abandonment
                while not stop.is_set():
                    try:
                        q.put(sentinel, timeout=0.1)
                        break
                    except queue.Full:
                        continue

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    break
                yield item
        finally:
            # runs on normal exhaustion AND on generator close (break /
            # exception in the consumer): without it the producer would
            # block forever on q.put and leak a thread + prefetched
            # batches (~400 MB each at production shapes) per epoch
            stop.set()
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass
            t.join(timeout=10.0)
        if error:
            raise error[0]
