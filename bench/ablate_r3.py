"""Round-3 same-process A/B measurements (run on the real chip, background).

Cases (each a full train step, scan-marginal method):
  fp32            the flagship config (baseline for this process)
  bf16_grouped    selective precision: SA grouped (B,S,K,C) stacks bf16,
                  FP decoder / heads / BN graphs outside SA fp32
                  (VERDICT r2 item 4's middle ground)
  bf16_all        whole-model bf16 (round-2's quality-compromised config,
                  re-measured here for the same-process delta)

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python bench/ablate_r3.py
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


def scan_marginal(make_looped, *args, short=2, long=12, reps=5):
    f_short = jax.jit(make_looped(short))
    f_long = jax.jit(make_looped(long))

    def run(f):
        out = f(*args)
        return float(
            jnp.asarray(jax.tree.leaves(out)[0], jnp.float32).ravel()[0]
        )

    run(f_short), run(f_long)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); run(f_short); ts = time.perf_counter() - t0
        t0 = time.perf_counter(); run(f_long); tl = time.perf_counter() - t0
        best = min(best, (tl - ts) / (long - short))
    return best


def step_ms_of(model_kwargs):
    from pointnet12_tpu.models import get_model
    from pointnet12_tpu.train import create_train_state, make_optimizer
    from pointnet12_tpu.train.loop import build_train_step

    model = get_model("pointnet2_semseg", num_classes=NUM_CLASSES,
                      **model_kwargs)
    key = jax.random.PRNGKey(0)
    points = jax.random.uniform(key, (BATCH, NUM_POINT, FEAT))
    labels = jax.random.randint(key, (BATCH, NUM_POINT), 0, NUM_CLASSES)
    batch = {"points": points, "label": labels}
    tx = make_optimizer("adam", steps_per_epoch=100)
    state0 = create_train_state(model, key, points[:1], tx)
    raw_step = build_train_step(model, task="seg", num_classes=NUM_CLASSES)

    def make_looped(k):
        def run(state, batch):
            def body(carry, _):
                st, m = raw_step(carry, batch, key)
                return st, m["loss"]

            _, losses = lax.scan(body, state, None, length=k)
            return losses[-1]

        return run

    return scan_marginal(make_looped, state0, batch) * 1e3


def main():
    out = {}
    out["fp32_ms"] = step_ms_of({})
    print(json.dumps({"partial": out}), flush=True)
    out["bf16_grouped_ms"] = step_ms_of({"grouped_dtype": jnp.bfloat16})
    print(json.dumps({"partial": out}), flush=True)
    out["bf16_all_ms"] = step_ms_of({"dtype": jnp.bfloat16})
    out["delta_grouped_ms"] = out["fp32_ms"] - out["bf16_grouped_ms"]
    out["delta_all_ms"] = out["fp32_ms"] - out["bf16_all_ms"]
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
