"""Same-process A/B of the three ball-query kernels: dense prefix-rank vs
voxel-grid v5 vs the bitmask kernel (MXU bit-pack + lowest-set-bit
extraction, kernels/ballquery_bitmask.py).

Also on-chip-verifies the bitmask kernel against the exact jnp reference
at each shape (boundary-masked, same criterion as bench.py --verify)
BEFORE timing, so a fast-but-wrong Mosaic lowering can't sneak in.

Shapes: the flagship semseg SA levels plus one MSG-style wide-K case.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python bench/bitmask_ab.py
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


def scan_marginal(make_looped, *args, short=2, long=42, reps=5):
    f_short = jax.jit(make_looped(short))
    f_long = jax.jit(make_looped(long))

    def run(f):
        out = f(*args)
        return float(
            jnp.asarray(jax.tree.leaves(out)[0], jnp.float32).ravel()[0]
        )

    run(f_short), run(f_long)
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter(); run(f_short); ts = time.perf_counter() - t0
        t0 = time.perf_counter(); run(f_long); tl = time.perf_counter() - t0
        samples.append((tl - ts) / (long - short))
    samples.sort()
    return samples[len(samples) // 2]  # median — see bench.py kernel note


def main():
    from pointnet12_tpu.kernels.ballquery_bitmask import ballquery_bitmask
    from pointnet12_tpu.kernels.ballquery_grid import ballquery_grid
    from pointnet12_tpu.kernels.ballquery_pallas import ballquery_pallas
    from pointnet12_tpu.ops.ballquery import _ballquery_jnp

    shapes = [
        # (tag, B, N, S, K, radius)
        ("SA1", 16, 4096, 1024, 32, 0.1),
        ("SA2", 16, 1024, 256, 32, 0.2),
        ("SA3", 16, 256, 64, 32, 0.4),
        ("MSG-K64", 16, 4096, 512, 64, 0.4),
    ]
    out = {}
    for tag, B, N, S, K, r in shapes:
        key = jax.random.PRNGKey(5)
        xyz = jax.random.uniform(key, (B, N, 3))
        qkey = jax.random.PRNGKey(6)
        new_xyz = xyz[:, :S, :] + 0.01 * jax.random.normal(qkey, (B, S, 3))

        # --- on-chip verification first (boundary-masked) ---
        want = np.asarray(_ballquery_jnp(r, K, xyz, new_xyz))
        got = np.asarray(ballquery_bitmask(r, K, xyz, new_xyz))
        d2 = np.sum(
            (np.asarray(new_xyz)[:, :, None, :] - np.asarray(xyz)[:, None])
            ** 2,
            -1,
        )
        ok = ~np.any(np.abs(d2 - r * r) < 1e-5, axis=-1)
        mism = int(((got != want) & ok[..., None]).sum())

        kernels = {"bitmask": ballquery_bitmask, "dense": ballquery_pallas}
        if N >= 1024 and N % 128 == 0 and S % 128 == 0:
            kernels["grid"] = ballquery_grid

        res = {"verify_mismatches": mism, "ok_frac": round(float(ok.mean()), 3)}
        for name, fn in kernels.items():
            def make_looped(k, fn=fn):
                def run(xyz, new_xyz):
                    def body(i, acc):
                        idx = fn(r, K, xyz + acc * 0, new_xyz)
                        return acc + idx[0, 0, 0].astype(jnp.float32)

                    return lax.fori_loop(0, k, body, jnp.float32(0))

                return run

            sec = scan_marginal(make_looped, xyz, new_xyz)
            res[name + "_ms"] = round(sec * 1e3, 3)
        out[tag] = res
        print(tag, json.dumps(res), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
