"""Train-mode forward-only (loss, no grad) marginal time + kernel verify.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python bench/fwd_only.py
"""
import sys

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
from jax import lax

import bench as bench_mod
from pointnet12_tpu.models import get_model
from pointnet12_tpu.train import create_train_state, make_optimizer
from pointnet12_tpu.train.losses import segmentation_loss

B, N, NC, F = 16, 4096, 13, 9
model = get_model("pointnet2_semseg", num_classes=NC)
key = jax.random.PRNGKey(0)
points = jax.random.uniform(key, (B, N, F))
labels = jax.random.randint(key, (B, N), 0, NC)
tx = make_optimizer("adam", steps_per_epoch=100)
state = create_train_state(model, key, points[:1], tx)


def loss_fn(params, batch_stats, pts, lbl):
    (logp, _), _ = model.apply(
        {"params": params, "batch_stats": batch_stats},
        pts,
        train=True,
        mutable=["batch_stats"],
        rngs={"dropout": key},
    )
    return segmentation_loss(logp, lbl)


def make_looped(k):
    def run(params, batch_stats, pts, lbl):
        def body(i, acc):
            return acc + loss_fn(params, batch_stats, pts + acc * 0, lbl)

        return lax.fori_loop(0, k, body, jnp.float32(0))

    return run


sec, spread = bench_mod._marginal_time(
    make_looped, state.params, state.batch_stats, points, labels
)
print(f"train fwd-only: {sec*1e3:.2f} ms (spread {spread:.3f})", flush=True)

v = bench_mod.verify_kernels()
print("verify:", v, flush=True)
