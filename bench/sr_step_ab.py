"""Same-process flagship step A/B: fp32 vs bf16_grouped vs bf16_grouped+SR.

The 40-epoch convergence probe showed stochastic rounding on the grouped
bf16 casts recovers bf16_grouped's plateau quality (mIoU 0.5328 vs fp32's
0.535; plain bf16_grouped plateaued at 0.39 — docs/PERFORMANCE.md). This
measures what the SR hash ops cost in-step: two independent compile draws
per config, worse draw is the honest number.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python bench/sr_step_ab.py
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


def step_ms(model_kwargs, draws=2):
    from pointnet12_tpu.models import get_model
    from pointnet12_tpu.train import create_train_state, make_optimizer
    from pointnet12_tpu.train.loop import build_train_step

    model = get_model("pointnet2_semseg", num_classes=NUM_CLASSES, **model_kwargs)
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
                st, _m = raw_step(carry, batch, key)
                return st, _m["loss"]

            _, losses = lax.scan(body, state, None, length=k)
            return losses[-1]

        return run

    out = []
    for d in range(draws):
        out.append(
            round(
                scan_marginal(
                    make_looped, state0, batch, short=2 + d, long=12 + d
                )
                * 1e3,
                2,
            )
        )
    return out


def main():
    res = {}
    res["fp32_ms_draws"] = step_ms({})
    res["bf16g_ms_draws"] = step_ms({"grouped_dtype": jnp.bfloat16})
    res["bf16g_sr_ms_draws"] = step_ms(
        {"grouped_dtype": jnp.bfloat16, "grouped_sr": True}
    )
    # full-bf16 + SR (--bf16 --bf16_sr): FP decoder + head also bf16, all
    # train casts stochastically rounded — the candidate next flagship if
    # the quality probe holds (round-2's plain --bf16 lost quality to the
    # same rounding bias SR fixed for bf16_grouped).
    res["bf16_full_sr_ms_draws"] = step_ms(
        {"dtype": jnp.bfloat16, "sr": True, "grouped_sr": True}
    )
    print(json.dumps(res))


if __name__ == "__main__":
    main()
