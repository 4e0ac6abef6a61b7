"""Fixed-shape batch feeder (the torch DataLoader equivalent).

Reference behavior (SURVEY.md §3.1): ``torch.utils.data.DataLoader`` with
shuffle + workers feeding numpy-augmented batches. TPU-native constraints:
every batch has IDENTICAL shapes (drop_last always on) so the jitted step
never recompiles, and a one-deep background prefetch thread overlaps host
batch assembly + augmentation with device compute.
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
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.augment_fn = augment_fn
        self.seed = seed
        self.prefetch = prefetch
        self._epoch = 0

    def __len__(self):
        return len(self.dataset) // self.batch_size  # drop_last semantics

    def _make_batches(self) -> Iterator[dict]:
        rng = np.random.RandomState(self.seed + self._epoch)
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
            yield {"points": points, "label": labels}
        self._epoch += 1

    def __iter__(self):
        if not self.prefetch:
            yield from self._make_batches()
            return
        q: queue.Queue = queue.Queue(maxsize=2)
        sentinel = object()

        def worker():
            try:
                for b in self._make_batches():
                    q.put(b)
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
