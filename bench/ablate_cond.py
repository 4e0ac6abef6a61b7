"""Test whether the grid BQ's in-step +5.6 ms regression comes from XLA
executing BOTH lax.cond branches (cond-to-select), by timing the full train
step with three SA1 ball-query variants:

  A. dense kernel (current dispatch)           — baseline
  B. grid with the dense fallback branch       — the regressing config
  C. grid with the fallback branch REPLACED by zeros (same prep, no dense
     kernel in the cond) — if B-C ~= dense-kernel time, both branches ran

Usage: PYTHONPATH=/root/repo:/root/.axon_site python bench/ablate_cond.py
"""

import time
from unittest import mock

import jax
import jax.numpy as jnp
from jax import lax

B, N, C, F = 16, 4096, 13, 9


def step_ms():
    from pointnet12_tpu.models import get_model
    from pointnet12_tpu.train import create_train_state, make_optimizer
    from pointnet12_tpu.train.loop import build_train_step

    model = get_model("pointnet2_semseg", num_classes=C)
    key = jax.random.PRNGKey(0)
    pts = jax.random.uniform(key, (B, N, F))
    lbl = jax.random.randint(key, (B, N), 0, C)
    batch = {"points": pts, "label": lbl}
    st0 = create_train_state(model, key, pts[:1], make_optimizer("adam", steps_per_epoch=100))
    raw = build_train_step(model, task="seg", num_classes=C)

    def make(k):
        def run(state, batch):
            def body(c, _):
                s, m = raw(c, batch, key)
                return s, m["loss"]
            _, l = lax.scan(body, state, None, length=k)
            return l[-1]
        return run

    fs, fl = jax.jit(make(2)), jax.jit(make(12))
    run = lambda f: float(jnp.asarray(f(st0, batch), jnp.float32))
    run(fs); run(fl)
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter(); run(fs); ts = time.perf_counter() - t0
        t0 = time.perf_counter(); run(fl); tl = time.perf_counter() - t0
        best = min(best, (tl - ts) / 10)
    return best * 1e3


def main():
    import pointnet12_tpu.ops.ballquery as bq_mod
    from pointnet12_tpu.kernels import ballquery_grid as bg

    print("A dense:", step_ms(), flush=True)

    orig_auto = bq_mod.query_ball_point

    def force_grid(radius, nsample, xyz, new_xyz, *, impl="auto"):
        if impl == "auto" and xyz.shape[1] >= 4096:
            return bg.ballquery_grid(radius, nsample, xyz, new_xyz)
        return orig_auto(radius, nsample, xyz, new_xyz, impl=impl)

    with mock.patch.object(bq_mod, "query_ball_point", force_grid), \
         mock.patch("pointnet12_tpu.nn.set_abstraction.query_ball_point", force_grid):
        jax.clear_caches()
        print("B grid+fallback:", step_ms(), flush=True)

    # C: fallback branch returns zeros (no dense kernel inside the cond)
    def fake_dense(radius, nsample, xyz, new_xyz, interpret=False):
        Bq, S = new_xyz.shape[0], new_xyz.shape[1]
        return jnp.zeros((Bq, S, nsample), jnp.int32)

    with mock.patch.object(bg, "ballquery_pallas", fake_dense), \
         mock.patch.object(bq_mod, "query_ball_point", force_grid), \
         mock.patch("pointnet12_tpu.nn.set_abstraction.query_ball_point", force_grid):
        jax.clear_caches()
        print("C grid+zero-fallback:", step_ms(), flush=True)


if __name__ == "__main__":
    main()
