"""Host input-pipeline margin at the flagship shape (VERDICT r5 item 6).

The train step is ~11.4-11.9 ms on-chip at B=16/N=4096; the Feeder
overlaps host batch assembly + augmentation with device compute via a
one-deep prefetch thread (data/loader.py). This measures the host side
standalone: dataset indexing + np.stack assembly, and each augment
recipe, per batch — if host-ms/batch exceeds ~50% of the step, the
prefetch has no slack and the feeder becomes the wall at real-dataset
scale.

Pure host measurement (no TPU needed). NOTE the box has ONE core: run
when the core is otherwise idle, or read the numbers as upper bounds.

Usage: PYTHONPATH=/root/repo python bench/feeder_margin.py
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from pointnet12_tpu.data.augment import (
    classification_augment,
    segmentation_augment,
)
from pointnet12_tpu.data.synthetic import SyntheticScene

B, N, REPS = 16, 4096, 20
STEP_MS = 11.9  # flagship train step, worse-of-pair band (bench.py r4)


def timed(fn, *args, reps=REPS, **kw):
    fn(*args, **kw)  # warm (allocator, caches)
    t0 = time.perf_counter()
    for _ in range(reps):
        fn(*args, **kw)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    ds = SyntheticScene("train", num_point=N, num_classes=13, size=B * 8)
    rng = np.random.RandomState(0)
    idxs = np.arange(B)

    def assemble():
        pts, lbls = zip(*(ds[int(i)] for i in idxs))
        return np.stack(pts), np.stack(lbls)

    points, _ = assemble()
    gen = np.random.Generator(np.random.PCG64(0))  # Feeder fast_rng path
    out = {
        "shape": [B, N, int(points.shape[-1])],
        "step_ms_ref": STEP_MS,
        "assemble_ms": round(timed(assemble), 2),
        "seg_augment_ms": round(
            timed(segmentation_augment, points, rng=rng), 2
        ),
        "cls_augment_ms": round(
            timed(classification_augment, points, rng=rng), 2
        ),
        "seg_augment_fast_ms": round(
            timed(segmentation_augment, points, rng=gen), 2
        ),
        "cls_augment_fast_ms": round(
            timed(classification_augment, points, rng=gen), 2
        ),
    }
    for tag, aug in [("seg", "seg_augment_ms"), ("seg_fast", "seg_augment_fast_ms")]:
        host = out["assemble_ms"] + out[aug]
        out[f"{tag}_host_ms"] = round(host, 2)
        out[f"{tag}_host_over_step"] = round(host / STEP_MS, 2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
