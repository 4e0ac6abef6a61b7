"""Serving throughput vs batch size (deployment guidance).

Eval-mode flagship forward (pointnet2_semseg, N=4096) across batch sizes,
marginal-loop measured. Serving cost is dominated by per-cloud work (FPS is
sequential per cloud, BQ/gathers scale with rows), so clouds/sec should be
near-flat in B; this sweep quantifies the fixed-overhead amortization and
finds the knee for deployments picking a serving batch.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python bench/serving_sweep.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

NUM_POINT, NUM_CLASSES, FEAT = 4096, 13, 9


def marginal(make_looped, *args, short=2, long=42, reps=5):
    """Median-of-reps with long loops: small-batch iterations are ~1-3 ms,
    where relay jitter between the paired runs makes min-of-reps
    underestimate badly (a first sweep read B=8 at 0.7 ms/batch — below
    the sequential-FPS floor alone; see bench.py's small-kernel note)."""
    f_short = jax.jit(make_looped(short))
    f_long = jax.jit(make_looped(long))

    def run(f):
        out = f(*args)
        return float(jnp.asarray(jax.tree.leaves(out)[0], jnp.float32).ravel()[0])

    run(f_short), run(f_long)
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter(); run(f_short); ts = time.perf_counter() - t0
        t0 = time.perf_counter(); run(f_long); tl = time.perf_counter() - t0
        samples.append((tl - ts) / (long - short))
    samples.sort()
    return samples[len(samples) // 2]


def main():
    from pointnet12_tpu.models import get_model

    model = get_model("pointnet2_semseg", num_classes=NUM_CLASSES)
    key = jax.random.PRNGKey(0)
    out = {}
    for B in (4, 8, 16, 32):
        points = jax.random.uniform(key, (B, NUM_POINT, FEAT))
        variables = model.init({"params": key}, points[:1], train=False)

        def make_looped(k, variables=variables):
            def run(points):
                def body(i, acc):
                    lp, _ = model.apply(variables, points + acc * 0, train=False)
                    return acc + lp[0, 0, 0]

                return lax.fori_loop(0, k, body, jnp.float32(0))

            return run

        ms = marginal(make_looped, points) * 1e3
        out[f"B{B}"] = {
            "batch_ms": round(ms, 2),
            "clouds_per_sec": round(B / ms * 1e3, 1),
        }
        print(json.dumps({f"B{B}": out[f"B{B}"]}), flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
