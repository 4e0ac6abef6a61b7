"""Train-step throughput vs batch size (flagship SR config).

Full train step (fwd+bwd+Adam) on pointnet2_semseg at N=4096 under the
benchmarked flagship precision (--bf16_grouped --bf16_sr), across batch
sizes. The headline metric stays pinned at B=16 (BENCH comparability
across rounds); this sweep answers whether per-chip training throughput
has a better operating point — FPS blocks 16 clouds (underfill below 16)
and fixed per-step overhead amortizes with B, while HBM working-set
growth eventually pushes grouped tensors past comfortable tiling.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python bench/train_b_sweep.py
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


def marginal(make_looped, *args, short=2, long=12, reps=5):
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
    from pointnet12_tpu.train import create_train_state, make_optimizer
    from pointnet12_tpu.train.loop import build_train_step

    model = get_model(
        "pointnet2_semseg",
        num_classes=NUM_CLASSES,
        dtype=jnp.bfloat16,
        sr=True,
        grouped_sr=True,
    )
    key = jax.random.PRNGKey(0)
    out = {}
    for B in (8, 16, 24, 32, 48):
        points = jax.random.uniform(key, (B, NUM_POINT, FEAT))
        labels = jax.random.randint(key, (B, NUM_POINT), 0, NUM_CLASSES)
        batch = {"points": points, "label": labels}
        tx = make_optimizer("adam", steps_per_epoch=100)
        state0 = create_train_state(model, key, points[:1], tx)
        raw_step = build_train_step(
            model, task="seg", num_classes=NUM_CLASSES
        )

        def make_looped(k, raw_step=raw_step, batch=batch):
            def run(state, batch):
                def body(carry, _):
                    st, _m = raw_step(carry, batch, key)
                    return st, ()

                final, _ = lax.scan(body, state, None, length=k)
                # DO return a param leaf, NOT final.step: `step` is just
                # +1 per iteration, so XLA constant-folds it and DCEs the
                # whole training computation (measured: negative marginal
                # times on the first run of this script).
                return jax.tree.leaves(final.params)[0]

            return run

        ms = marginal(make_looped, state0, batch) * 1e3
        out[f"B{B}"] = {
            "step_ms": round(ms, 2),
            "clouds_per_sec": round(B / ms * 1e3, 1),
        }
        print(json.dumps({f"B{B}": out[f"B{B}"]}), flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
