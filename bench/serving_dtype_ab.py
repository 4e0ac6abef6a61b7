"""Serving precision A/B: fp32 vs bf16 eval forward (same variables).

The flagship TRAIN config is --bf16 --bf16_sr, and its 40-epoch probe
already validated EVAL-mode bf16 quality (mIoU 0.5345 vs fp32 0.535,
bench/convergence_probe.py) — eval casts are plain round-to-nearest (SR
is train-only). But the serving metric (bench.py::bench_inference) still
builds the model at fp32. This measures what a dtype=bfloat16 Predictor
buys: same checkpoint variables (params/BN stats are fp32 under either
dtype), same-process marginal-loop timing, plus logit-delta / label-
agreement numbers on the same random batch as a sanity cross-check
(the probe above is the real quality evidence).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python bench/serving_dtype_ab.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
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


def main():
    from pointnet12_tpu.models import get_model

    key = jax.random.PRNGKey(0)
    points = jax.random.uniform(key, (BATCH, NUM_POINT, FEAT))

    # one set of variables serves both dtypes (param_dtype is pinned fp32)
    model32 = get_model("pointnet2_semseg", num_classes=NUM_CLASSES)
    variables = model32.init({"params": key}, points[:1], train=False)

    out = {}
    logits = {}
    for tag, kwargs in (
        ("fp32", {}),
        ("bf16", {"dtype": jnp.bfloat16}),
    ):
        model = get_model("pointnet2_semseg", num_classes=NUM_CLASSES, **kwargs)

        lp = jax.jit(
            lambda pts, m=model: m.apply(variables, pts, train=False)[0]
        )(points)
        logits[tag] = np.asarray(lp, np.float32)

        def make_looped(k, m=model):
            def run(pts):
                def body(i, acc):
                    lp, _ = m.apply(variables, pts + acc * 0, train=False)
                    return acc + lp[0, 0, 0].astype(jnp.float32)

                return lax.fori_loop(0, k, body, jnp.float32(0))

            return run

        ms = marginal(make_looped, points) * 1e3
        out[f"{tag}_ms"] = round(ms, 3)
        out[f"{tag}_clouds_per_sec"] = round(BATCH / ms * 1e3, 1)
        print(json.dumps({"partial": out}), flush=True)

    d = np.abs(logits["bf16"] - logits["fp32"])
    agree = (logits["bf16"].argmax(-1) == logits["fp32"].argmax(-1)).mean()
    out["max_abs_logit_delta"] = round(float(d.max()), 4)
    out["mean_abs_logit_delta"] = round(float(d.mean()), 5)
    out["label_agreement"] = round(float(agree), 5)
    out["speedup"] = round(out["fp32_ms"] / out["bf16_ms"], 3)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
