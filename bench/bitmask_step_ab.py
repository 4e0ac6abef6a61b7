"""Same-process flagship train-step A/B: round-2 dispatch (grid BQ at SA1,
dense at SA2-4) vs round-3 bitmask dispatch (bitmask from N>=1024).

Patches ops.ballquery's module-level crossover constants between builds;
each configuration gets freshly-jitted loop pairs, so the dispatch decision
(made at trace time) is re-taken per config.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python bench/bitmask_step_ab.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

import pointnet12_tpu.ops.ballquery as bq_mod

B, N, NCLS, FEAT = 16, 4096, 13, 9


def scan_marginal(make_looped, *args, short=2, long=12, reps=5):
    f_short = jax.jit(make_looped(short))
    f_long = jax.jit(make_looped(long))

    def run(f):
        out = f(*args)
        return float(
            jnp.asarray(jax.tree.leaves(out)[0], jnp.float32).ravel()[0]
        )

    run(f_short), run(f_long)
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter(); run(f_short); ts = time.perf_counter() - t0
        t0 = time.perf_counter(); run(f_long); tl = time.perf_counter() - t0
        samples.append((tl - ts) / (long - short))
    samples.sort()
    return samples[0], samples[len(samples) // 2]


def step_ms():
    from pointnet12_tpu.models import get_model
    from pointnet12_tpu.train import create_train_state, make_optimizer
    from pointnet12_tpu.train.loop import build_train_step

    model = get_model("pointnet2_semseg", num_classes=NCLS)
    key = jax.random.PRNGKey(0)
    points = jax.random.uniform(key, (B, N, FEAT))
    labels = jax.random.randint(key, (B, N), 0, NCLS)
    batch = {"points": points, "label": labels}
    tx = make_optimizer("adam", steps_per_epoch=100)
    state0 = create_train_state(model, key, points[:1], tx)
    raw_step = build_train_step(model, task="seg", num_classes=NCLS)

    def make_looped(k):
        def run(state, batch):
            def body(carry, _):
                st, _m = raw_step(carry, batch, key)
                return st, _m["loss"]

            _, losses = lax.scan(body, state, None, length=k)
            return losses[-1]

        return run

    best, med = scan_marginal(make_looped, state0, batch)
    return round(best * 1e3, 2), round(med * 1e3, 2)


def main():
    out = {}
    # A: round-2 dispatch (grid at N>=4096, dense below)
    bq_mod.BITMASK_MIN_N = 10**9
    bq_mod.GRID_MIN_N = 4096
    out["grid_dispatch_ms"] = step_ms()
    # B: round-3 dispatch (bitmask from N>=1024)
    bq_mod.BITMASK_MIN_N = 1024
    bq_mod.GRID_MIN_N = 16384
    out["bitmask_dispatch_ms"] = step_ms()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
