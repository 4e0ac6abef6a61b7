"""Round-2 step-anatomy ablation (run on the real chip, background).

Isolates where the ~8 ms between fwd+bwd (~14 ms) and the full train step
(~23 ms) lives:
  C1  fwd only (loss scalar carried)
  C2  fwd+bwd, grads reduced to a scalar (no param materialization)
  C3  fwd+bwd + sgd-like tree update, updated params CARRIED (90 tensors)
  C3b same but params carried as ONE flat fp32 vector (unravel inside)
  C4  the real train step (optax flatten adam + BN stats), scan carry
  D   C4 with jax.checkpoint around the whole apply

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python bench/ablate_r2.py
"""

import json
import time

import jax
import jax.numpy as jnp
from jax import lax
from jax.flatten_util import ravel_pytree

BATCH, NUM_POINT, NUM_CLASSES, FEAT = 16, 4096, 13, 9


def scan_marginal(make_looped, *args, short=2, long=12, reps=5):
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
    from pointnet12_tpu.train import create_train_state, make_optimizer
    from pointnet12_tpu.train import losses as losses_lib
    from pointnet12_tpu.train.loop import build_train_step

    model = get_model("pointnet2_semseg", num_classes=NUM_CLASSES)
    key = jax.random.PRNGKey(0)
    points = jax.random.uniform(key, (BATCH, NUM_POINT, FEAT))
    labels = jax.random.randint(key, (BATCH, NUM_POINT), 0, NUM_CLASSES)
    batch = {"points": points, "label": labels}
    tx = make_optimizer("adam", steps_per_epoch=100)
    state0 = create_train_state(model, key, points[:1], tx)
    raw_step = build_train_step(model, task="seg", num_classes=NUM_CLASSES)
    out = {}

    def loss_of(params, bs, pts):
        (logp, _), mut = model.apply(
            {"params": params, "batch_stats": bs}, pts, train=True,
            fps_key=key, mutable=["batch_stats"], rngs={"dropout": key},
        )
        return losses_lib.segmentation_loss(logp, labels), mut["batch_stats"]

    # --- C1 fwd only -------------------------------------------------------
    def make_c1(k):
        def run(state, batch):
            def body(c, _):
                l, _bs = loss_of(state.params, state.batch_stats,
                                 batch["points"] + c * 0)
                return l, None
            l, _ = lax.scan(body, jnp.float32(0), None, length=k)
            return l
        return run

    out["C1_fwd_ms"] = scan_marginal(make_c1, state0, batch) * 1e3
    print("C1", out["C1_fwd_ms"], flush=True)

    # --- C2 fwd+bwd, scalar grads ------------------------------------------
    def make_c2(k):
        def run(state, batch):
            def body(c, _):
                g = jax.grad(
                    lambda p: loss_of(p, state.batch_stats,
                                      batch["points"] + c)[0]
                )(state.params)
                gs = sum(jnp.sum(x) for x in jax.tree.leaves(g))
                return gs * 1e-20, None
            g, _ = lax.scan(body, jnp.float32(0), None, length=k)
            return g
        return run

    out["C2_fwd_bwd_ms"] = scan_marginal(make_c2, state0, batch) * 1e3
    print("C2", out["C2_fwd_bwd_ms"], flush=True)

    # --- C3 fwd+bwd + tree sgd update, params carried -----------------------
    def make_c3(k):
        def run(state, batch):
            def body(params, _):
                g = jax.grad(
                    lambda p: loss_of(p, state.batch_stats, batch["points"])[0]
                )(params)
                new_p = jax.tree.map(lambda p, gg: p - 1e-9 * gg, params, g)
                return new_p, None
            p, _ = lax.scan(body, state.params, None, length=k)
            return jax.tree.leaves(p)[0]
        return run

    out["C3_carry_tree_ms"] = scan_marginal(make_c3, state0, batch) * 1e3
    print("C3", out["C3_carry_tree_ms"], flush=True)

    # --- C3b same but flat param vector carry -------------------------------
    flat0, unravel = ravel_pytree(state0.params)

    def make_c3b(k):
        def run(state, batch, flat0):
            def body(flat, _):
                g = jax.grad(
                    lambda p: loss_of(p, state.batch_stats, batch["points"])[0]
                )(unravel(flat))
                gflat, _ = ravel_pytree(g)
                return flat - 1e-9 * gflat, None
            f, _ = lax.scan(body, flat0, None, length=k)
            return f[0]
        return run

    out["C3b_carry_flat_ms"] = (
        scan_marginal(make_c3b, state0, batch, flat0) * 1e3
    )
    print("C3b", out["C3b_carry_flat_ms"], flush=True)

    # --- C4 real step -------------------------------------------------------
    def make_c4(k):
        def run(state, batch):
            def body(st, _):
                st2, m = raw_step(st, batch, key)
                return st2, m["loss"]
            _, losses = lax.scan(body, state, None, length=k)
            return losses[-1]
        return run

    out["C4_full_step_ms"] = scan_marginal(make_c4, state0, batch) * 1e3
    print("C4", out["C4_full_step_ms"], flush=True)

    # --- D remat ------------------------------------------------------------
    loss_r = jax.checkpoint(loss_of, static_argnums=())

    def make_d(k):
        def run(state, batch):
            def body(params, _):
                g = jax.grad(
                    lambda p: loss_r(p, state.batch_stats, batch["points"])[0]
                )(params)
                new_p = jax.tree.map(lambda p, gg: p - 1e-9 * gg, params, g)
                return new_p, None
            p, _ = lax.scan(body, state.params, None, length=k)
            return jax.tree.leaves(p)[0]
        return run

    out["D_remat_carry_ms"] = scan_marginal(make_d, state0, batch) * 1e3
    print("D", out["D_remat_carry_ms"], flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
