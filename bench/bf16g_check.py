"""Verify the suspicious bf16_grouped 4.6 ms measurement (round 3).

ablate_r3 measured grouped-bf16 at 4.64 ms/step vs fp32 14.55 — below the
5-7 ms speed-of-light estimate and 6.4 ms FASTER than whole-model bf16,
which is structurally implausible. This harness checks:
  1. reproducibility: two independent compile draws per config,
  2. numerics: 30-step training-loss trajectories from the SAME init for
     fp32 vs bf16_grouped (silent NaN/garbage would surface as divergence),
  3. the first-step loss of both configs (forward parity on-chip).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python bench/bf16g_check.py
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


def build(model_kwargs):
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
    return raw_step, state0, batch, key


def step_ms(raw_step, state0, batch, key, short=2, long=12):
    def make_looped(k):
        def run(state, batch):
            def body(carry, _):
                st, m = raw_step(carry, batch, key)
                return st, m["loss"]

            _, losses = lax.scan(body, state, None, length=k)
            return losses[-1]

        return run

    return scan_marginal(make_looped, state0, batch, short=short, long=long) * 1e3


def trajectory(raw_step, state0, batch, key, n=30):
    @jax.jit
    def steps(state, batch):
        def body(carry, _):
            st, m = raw_step(carry, batch, key)
            return st, m["loss"]

        _, losses = lax.scan(body, state, None, length=n)
        return losses

    return [round(float(x), 4) for x in steps(state0, batch)]


def main():
    out = {}
    s32 = build({})
    s16 = build({"grouped_dtype": jnp.bfloat16})

    out["fp32_draw1_ms"] = step_ms(*s32)
    out["bf16g_draw1_ms"] = step_ms(*s16)
    print(json.dumps({"partial": out}), flush=True)
    out["fp32_draw2_ms"] = step_ms(*s32, short=3, long=13)
    out["bf16g_draw2_ms"] = step_ms(*s16, short=3, long=13)
    print(json.dumps({"partial": out}), flush=True)

    tr32 = trajectory(*s32)
    tr16 = trajectory(*s16)
    out["fp32_loss_traj"] = tr32[:5] + ["..."] + tr32[-3:]
    out["bf16g_loss_traj"] = tr16[:5] + ["..."] + tr16[-3:]
    out["traj_mean_absdiff"] = round(
        sum(abs(a - b) for a, b in zip(tr32, tr16)) / len(tr32), 4
    )
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
