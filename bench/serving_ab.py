"""Serving (eval-forward) A/B: fused eval-SA kernels vs the unfused path.

Same-process marginal-loop measurement of the flagship eval forward
(B=16, N=4096) with the fused dispatch enabled (production default on TPU)
and disabled (round-2 path: grid/dense BQ + lifted gather + folded matmuls).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python bench/serving_ab.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

BATCH, NUM_POINT, NUM_CLASSES, FEAT = 16, 4096, 13, 9


def marginal(make_looped, *args, short=2, long=12, reps=5):
    f_short = jax.jit(make_looped(short))
    f_long = jax.jit(make_looped(long))

    def run(f):
        out = f(*args)
        return float(jnp.asarray(jax.tree.leaves(out)[0], jnp.float32).ravel()[0])

    run(f_short), run(f_long)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); run(f_short); ts = time.perf_counter() - t0
        t0 = time.perf_counter(); run(f_long); tl = time.perf_counter() - t0
        best = min(best, (tl - ts) / (long - short))
    return best


def eval_ms(fused: bool):
    from pointnet12_tpu.models import get_model
    from pointnet12_tpu.nn import set_abstraction as sa_mod

    orig = sa_mod._fused_eval_ok
    if not fused:
        sa_mod._fused_eval_ok = lambda *a, **k: False
    try:
        model = get_model("pointnet2_semseg", num_classes=NUM_CLASSES)
        key = jax.random.PRNGKey(0)
        points = jax.random.uniform(key, (BATCH, NUM_POINT, FEAT))
        variables = model.init({"params": key}, points[:1], train=False)

        def make_looped(k):
            def run(points):
                def body(i, acc):
                    lp, _ = model.apply(variables, points + acc * 0, train=False)
                    return acc + lp[0, 0, 0]

                return lax.fori_loop(0, k, body, jnp.float32(0))

            return run

        return marginal(make_looped, points) * 1e3
    finally:
        sa_mod._fused_eval_ok = orig


def main():
    out = {}
    out["unfused_ms"] = eval_ms(False)
    print(json.dumps({"partial": out}), flush=True)
    out["fused_ms"] = eval_ms(True)
    out["unfused_clouds_per_sec"] = BATCH / out["unfused_ms"] * 1e3
    out["fused_clouds_per_sec"] = BATCH / out["fused_ms"] * 1e3
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
