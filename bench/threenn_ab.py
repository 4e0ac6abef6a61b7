"""Same-process A/B of the three_nn kernel's distance-tile strategies:
direct form (8 VPU ops/element, the shipping kernel) vs MXU expansion
form (qn + pn - 2 q.p with the cross term as a K=3 HIGHEST contraction).

Motivation: the round-4 serving floor audit marks three_nn "near-wall" —
0.75 ms measured vs a ~0.4 ms pencil floor for the EXTRACTION passes
alone, i.e. the d2 tile compute (~8 of ~30 VPU ops/element) is the one
slice with an offload candidate. This decides whether that candidate is
real before any default flips.

Verifies on-chip first (distance values allclose; index parity off
near-tie rows, same criterion as the runtime selfcheck) so a
fast-but-wrong Mosaic lowering can't win the A/B.

Loop bodies follow the round-4 anti-elision recipe (CLAUDE.md): inputs
tied to the carry via lax.optimization_barrier, every output consumed,
100-iteration loops for sub-ms kernels.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python bench/threenn_ab.py
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


def scan_marginal(make_looped, *args, short=4, long=104, reps=5):
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
    return samples[len(samples) // 2]


def main():
    from pointnet12_tpu.kernels import selfcheck
    from pointnet12_tpu.kernels.threenn_pallas import three_nn_pallas

    shapes = [
        # (tag, B, N queries, M refs) — the flagship FP levels
        ("FP1", 16, 4096, 1024),
        ("FP2", 16, 1024, 256),
    ]
    out = {}
    for tag, B, N, M in shapes:
        key = jax.random.PRNGKey(7)
        q = jax.random.uniform(key, (B, N, 3))
        p = jax.random.uniform(jax.random.PRNGKey(8), (B, M, 3))

        # --- on-chip verification first ---
        d0, i0 = three_nn_pallas(q, p)
        d1, i1 = three_nn_pallas(q, p, mxu=True)
        dmax = float(jnp.max(jnp.abs(d0 - d1)))
        ok = np.asarray(selfcheck.tie_ok_mask(q, p))[..., None]
        mism = int(((np.asarray(i0) != np.asarray(i1)) & ok).sum())

        res = {"d_maxdiff": dmax, "idx_mismatches_offtie": mism}
        for name, mxu in (("direct", False), ("mxu", True)):
            def make_looped(k, mxu=mxu):
                def run(q, p):
                    def body(_i, carry):
                        acc, qc = carry
                        qb = lax.optimization_barrier(qc + acc * 0)
                        d, i = three_nn_pallas(qb, p, mxu=mxu)
                        acc = acc + jnp.sum(d[0, 0, :]) + jnp.float32(
                            i[0, 0, 0]
                        )
                        return acc, qc

                    return lax.fori_loop(
                        0, k, body, (jnp.float32(0), q)
                    )

                return run

            sec = scan_marginal(make_looped, q, p)
            res[name + "_ms"] = round(sec * 1e3, 4)
        out[tag] = res
        print(tag, json.dumps(res), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
