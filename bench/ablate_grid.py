"""Micro-bench the grid-BQ prep pieces at the flagship shape (B=16, N=4096,
S=1024) to target the counting-sort replacement."""

import json
import time

import jax
import jax.numpy as jnp
from jax import lax

B, N, S, K, RADIUS = 16, 4096, 1024, 32, 0.1
G, H = 8, 512


def marginal(make_looped, *args, short=2, long=22, reps=5):
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
    return best * 1e3  # ms


def loop(fn):
    def make(k):
        def run(*args):
            def body(i, acc):
                r = fn(*args, acc)
                return acc * 0 + jnp.asarray(r, jnp.float32).ravel()[0] * 1e-20 + acc
            return lax.fori_loop(0, k, body, jnp.float32(0))
        return run
    return make


def main():
    from pointnet12_tpu.kernels.ballquery_grid import (
        _cell_offsets, _take1, ballquery_grid,
    )
    from pointnet12_tpu.kernels.ballquery_pallas import ballquery_pallas
    from pointnet12_tpu.ops.gather import index_points
    from pointnet12_tpu.kernels.fps_pallas import fps_pallas

    key = jax.random.PRNGKey(1)
    xyz = jax.random.uniform(key, (B, N, 3))
    new_xyz = jax.jit(index_points)(
        xyz, fps_pallas(xyz, S, jnp.zeros((B,), jnp.int32))
    )
    lo = jnp.min(xyz, axis=1, keepdims=True)
    hi = jnp.max(xyz, axis=1, keepdims=True)
    g = jnp.maximum(jnp.max(hi - lo, -1, keepdims=True) / G, RADIUS)
    cell = jnp.clip(jnp.floor((xyz - lo) / g).astype(jnp.int32), 0, G - 1)
    ckey = (cell[..., 0] * G + cell[..., 1]) * G + cell[..., 2]
    skey = jnp.sort(ckey, axis=1)

    # loop-dependency injection for INT inputs: int `acc*0` constant-folds
    # and the op hoists out of the loop; a data-dependent comparison doesn't
    dep = lambda acc: (acc > jnp.float32(1e30)).astype(jnp.int32)

    out = {}
    out["argsort_N_ms"] = marginal(
        loop(lambda k, acc: jnp.argsort(k + dep(acc), axis=1)[0, 0]), ckey
    )
    print("argsort_N", out["argsort_N_ms"], flush=True)
    out["sort_vals_N_ms"] = marginal(
        loop(lambda k, acc: jnp.sort(k + dep(acc), axis=1)[0, 0]), ckey
    )
    print("sort_vals_N", out["sort_vals_N_ms"], flush=True)
    out["cell_offsets_ms"] = marginal(
        loop(lambda s, acc: _cell_offsets(s + dep(acc))[0, 0]), skey
    )
    print("cell_offsets", out["cell_offsets_ms"], flush=True)
    out["grid_total_ms"] = marginal(
        loop(lambda x, q, acc: ballquery_grid(RADIUS, K, x + acc * 0, q)[0, 0, 0]),
        xyz, new_xyz,
    )
    print("grid_total", out["grid_total_ms"], flush=True)
    out["dense_total_ms"] = marginal(
        loop(lambda x, q, acc: ballquery_pallas(RADIUS, K, x + acc * 0, q)[0, 0, 0]),
        xyz, new_xyz,
    )
    print("dense_total", out["dense_total_ms"], flush=True)

    # scatter-based permutation write (counting-sort output path candidate)
    pos = jnp.argsort(ckey, axis=1).astype(jnp.int32)  # stand-in positions
    iota = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None], (B, N))

    def scatter_perm(p, acc):
        z = jnp.zeros((B, N), jnp.int32)
        r = jax.vmap(lambda zz, pp, ii: zz.at[pp].set(ii, unique_indices=True))(
            z, p + dep(acc), iota
        )
        return r[0, 0]

    out["scatter_perm_ms"] = marginal(loop(scatter_perm), pos)
    print("scatter_perm", out["scatter_perm_ms"], flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
