"""MSG performance pass (VERDICT r3 item 8): same-process A/B for
pointnet2_cls_msg (63.8 ms/step in round 2 — 4.3x slower than SSG cls).

MSG's cost is structural: three grouped-MLP branches up to K=128 push ~2.9M
grouped rows/step through train-BN at B=24 (4x the flagship's row count).
Candidates measured here:
  base           fp32, current dispatch (dense BQ at N=1024)
  bf16_grouped   selective bf16 on the grouped branch stacks
  bf16_all       whole-model bf16

Usage: PYTHONPATH=/root/repo:/root/.axon_site python bench/msg_ab.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

B, N, NCLS = 24, 1024, 40


def scan_marginal(make_looped, *args, short=2, long=8, reps=5):
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


def step_ms(model_kwargs):
    from pointnet12_tpu.models import get_model
    from pointnet12_tpu.train import create_train_state, make_optimizer
    from pointnet12_tpu.train.loop import build_train_step

    model = get_model("pointnet2_cls_msg", num_classes=NCLS, **model_kwargs)
    key = jax.random.PRNGKey(0)
    points = jax.random.uniform(key, (B, N, 3))
    labels = jax.random.randint(key, (B,), 0, NCLS)
    batch = {"points": points, "label": labels}
    tx = make_optimizer("adam", steps_per_epoch=100)
    state0 = create_train_state(model, key, points[:1], tx)
    raw_step = build_train_step(model, task="cls", num_classes=NCLS)

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
    out["base_ms"] = step_ms({})
    print(json.dumps({"partial": out}), flush=True)
    out["bf16_grouped_ms"] = step_ms({"grouped_dtype": jnp.bfloat16})
    print(json.dumps({"partial": out}), flush=True)
    # the round-3 flagship precision config (quality-neutral: see
    # docs/PERFORMANCE.md stochastic-rounding section)
    out["bf16_grouped_sr_ms"] = step_ms(
        {"grouped_dtype": jnp.bfloat16, "grouped_sr": True}
    )
    print(json.dumps({"partial": out}), flush=True)
    out["bf16_all_ms"] = step_ms({"dtype": jnp.bfloat16})
    print(json.dumps({"partial": out}), flush=True)
    # the promoted flagship precision config (--bf16 --bf16_sr)
    out["bf16_full_sr_ms"] = step_ms(
        {"dtype": jnp.bfloat16, "sr": True, "grouped_sr": True}
    )
    out["speedup_grouped"] = out["base_ms"] / out["bf16_grouped_ms"]
    out["speedup_grouped_sr"] = out["base_ms"] / out["bf16_grouped_sr_ms"]
    out["speedup_full_sr"] = out["base_ms"] / out["bf16_full_sr_ms"]
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
