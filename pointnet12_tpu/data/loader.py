"""Fixed-shape batch feeder (the torch DataLoader equivalent).

Reference behavior (SURVEY.md §3.1): ``torch.utils.data.DataLoader`` with
shuffle + workers feeding numpy-augmented batches. TPU-native constraints:
every batch has IDENTICAL shapes so the jitted step never recompiles, and a
one-deep background prefetch thread overlaps host batch assembly +
augmentation with device compute.

Two tail-batch policies:
  * training (default): drop_last — a short tail would change gradient
    statistics and shapes.
  * eval (``pad_last=True``): the tail batch is right-padded by repeating
    the last sample and every batch carries a ``"mask"`` (B,) validity
    vector, so the eval consumes EVERY sample (the reference evaluates the
    full set; silently dropping up to B-1 samples breaks comparability).
"""

import queue
import threading
from typing import Callable, Iterator, Optional

import numpy as np


class Feeder:
    """Iterates dict batches {"points": (B, N, C), "label": (B,) or (B, N)}."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        augment_fn: Optional[Callable] = None,
        seed: int = 0,
        prefetch: bool = True,
        pad_last: bool = False,
        fast_rng: bool = False,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.augment_fn = augment_fn
        self.seed = seed
        self.prefetch = prefetch
        self.pad_last = pad_last
        # fast_rng: epoch rng is a PCG64 np.random.Generator instead of the
        # legacy RandomState — ~1.6-2x faster gaussian jitter draws, in
        # float32 (bench/feeder_margin.py round 5). DIFFERENT stream: keep
        # False for runs that must reproduce recorded trajectories
        # (convergence probes / quality-parity); turn on for production
        # training where the host augment pass competes with the step.
        self.fast_rng = fast_rng
        self._epoch = 0

    def _rng(self, seed: int):
        if self.fast_rng:
            return np.random.Generator(np.random.PCG64(seed))
        return np.random.RandomState(seed)

    def __len__(self):
        if self.pad_last:
            return -(-len(self.dataset) // self.batch_size)  # ceil
        return len(self.dataset) // self.batch_size  # drop_last semantics

    def _make_batches(self) -> Iterator[dict]:
        rng = self._rng(self.seed + self._epoch)
        order = np.arange(len(self.dataset))
        if self.shuffle:
            rng.shuffle(order)
        nb = len(self)
        for bi in range(nb):
            idxs = order[bi * self.batch_size : (bi + 1) * self.batch_size]
            pts, lbls = zip(*(self.dataset[int(i)] for i in idxs))
            points = np.stack(pts)
            labels = np.stack(lbls)
            if self.augment_fn is not None:
                points = self.augment_fn(points, rng=rng)
            batch = {"points": points, "label": labels}
            if self.pad_last:
                n_valid = len(idxs)
                if n_valid < self.batch_size:  # pad by repeating the last
                    reps = self.batch_size - n_valid
                    batch["points"] = np.concatenate(
                        [points, np.repeat(points[-1:], reps, axis=0)]
                    )
                    batch["label"] = np.concatenate(
                        [labels, np.repeat(labels[-1:], reps, axis=0)]
                    )
                mask = np.zeros(self.batch_size, np.float32)
                mask[:n_valid] = 1.0
                batch["mask"] = mask
            yield batch
        self._epoch += 1

    def stat_batches(self, num_batches: int, augment: bool = True):
        """Side-channel batches for statistics recomputation (precise BN).

        Unlike ``__iter__`` this does NOT advance the epoch counter, so the
        training shuffle/augmentation stream is unaffected by interleaved
        stat passes (VERDICT r2 weak #8). Augmentation (on by default, to
        match the training activation distribution) draws from a dedicated
        RNG seeded off the current epoch.
        """
        rng = self._rng(self.seed + self._epoch + 777_001)
        order = np.arange(len(self.dataset))
        if self.shuffle:
            rng.shuffle(order)
        nb = min(num_batches, len(self.dataset) // self.batch_size)
        for bi in range(nb):
            idxs = order[bi * self.batch_size : (bi + 1) * self.batch_size]
            pts, lbls = zip(*(self.dataset[int(i)] for i in idxs))
            points = np.stack(pts)
            if augment and self.augment_fn is not None:
                points = self.augment_fn(points, rng=rng)
            yield {"points": points, "label": np.stack(lbls)}

    def __iter__(self):
        if not self.prefetch:
            yield from self._make_batches()
            return
        q: queue.Queue = queue.Queue(maxsize=2)
        sentinel = object()
        # A raise inside _make_batches (bad file, augment bug) must surface in
        # the consumer, not silently truncate the epoch: capture it and
        # re-raise after draining (VERDICT r2 weak #2).
        error: list = []

        def worker():
            try:
                for b in self._make_batches():
                    q.put(b)
            except BaseException as e:  # noqa: BLE001 — re-raised below
                error.append(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item
        t.join()
        if error:
            raise error[0]
