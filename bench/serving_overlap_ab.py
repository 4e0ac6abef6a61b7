"""Serving occupancy attack: cross-batch pipelining inside one program
(VERDICT r5 item 2).

The round-4 serving floor audit (docs/PERFORMANCE.md) shows the 16-cloud
eval forward as a SUM of serial walls living on DIFFERENT hardware units:
descriptor-issue-bound gathers (1.91 ms), VPU-bound ball-query extraction
(1.29) + FPS (0.79) + three_nn (0.75), copy-engine relayouts (0.59), MXU
matmuls (~0.8). Every round-3/4 attempt attacked per-op latency and
dead-ended; the untried structural idea is OCCUPANCY — overlap batch B's
descriptor/VPU phases under batch A's MXU phases.

Variants (all compute 16 clouds/iteration, eval-mode pointnet2_semseg
fp32 — the serving config):

  mono    one B=16 forward                      (the baseline)
  split2  two independent B=8 forwards in ONE jitted program — XLA sees
          two disjoint subgraphs and its scheduler is free to interleave
          ops from the two chains across units
  split4  four independent B=4 forwards in one program
  async2  two separate B=8 jitted dispatches in flight before the first
          block (host-side pipelining; device-side the single core runs
          programs in-order, so this bounds dispatch overlap only)
  dual16  two independent B=16 forwards in ONE program, timed per 32
          clouds. The deconfounded occupancy test: split2/split4 halve
          or quarter the batch, so their loss mixes the measured B=16
          batch-knee penalty with lack-of-overlap; dual16 keeps BOTH
          chains at the optimal per-kernel shape. If the scheduler can
          interleave units at all, dual16's per-cloud time beats mono's.

If split2/split4 land at mono's time, the core serializes HLO ops
regardless of dependence structure and the occupancy idea is a measured
dead end (the honest outcome the verdict asked to record either way).

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
           python bench/serving_overlap_ab.py [--xla_lhs]
  --xla_lhs: retry with xla_tpu_enable_latency_hiding_scheduler=true.
             NOTE: passed per-compile via jax.jit(compiler_options=...) —
             this libtpu build's XLA_FLAGS env parser does not know the
             TPU-side flag (fatal "Unknown flag in XLA_FLAGS", measured
             round 5), but the debug-option name exists in libtpu and is
             accepted through compiler_options.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

_COMPILER_OPTIONS = (
    {"xla_tpu_enable_latency_hiding_scheduler": "true"}
    if "--xla_lhs" in sys.argv
    else None
)


def _jit(f):
    return jax.jit(f, compiler_options=_COMPILER_OPTIONS)

NUM_POINT, NUM_CLASSES, FEAT, TOTAL = 4096, 13, 9, 16


def marginal(make_looped, *args, short=2, long=22, reps=5):
    f_short = _jit(make_looped(short))
    f_long = _jit(make_looped(long))

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

    model = get_model("pointnet2_semseg", num_classes=NUM_CLASSES)
    key = jax.random.PRNGKey(0)
    points = jax.random.uniform(key, (TOTAL, NUM_POINT, FEAT))
    variables = model.init({"params": key}, points[:1], train=False)

    def fwd(p):
        lp, _ = model.apply(variables, p, train=False)
        return lp

    def make_split(n_chunks):
        chunk = TOTAL // n_chunks

        def make_looped(k):
            def run(points):
                def body(i, acc):
                    # barrier ties the input to the carry: defeats
                    # loop-invariant hoisting without perturbing values
                    p = lax.optimization_barrier((points, acc))[0]
                    outs = [
                        fwd(p[c * chunk : (c + 1) * chunk])
                        for c in range(n_chunks)
                    ]
                    # full-tensor sum: consuming a slice would let XLA
                    # narrow the head matmul to one class (measurement
                    # discipline, CLAUDE.md) — the reduce itself is ~3 MB
                    return acc + sum(o.sum() for o in outs)

                return lax.fori_loop(0, k, body, jnp.float32(0))

            return run

        return make_looped

    out = {}
    for name, n_chunks in (("mono", 1), ("split2", 2), ("split4", 4)):
        ms = marginal(make_split(n_chunks), points) * 1e3
        out[name] = {
            "batch_ms": round(ms, 2),
            "clouds_per_sec": round(TOTAL / ms * 1e3, 1),
        }
        print(json.dumps({name: out[name]}), flush=True)

    # dual16: two independent FULL B=16 chains in one program (32 clouds
    # per loop iteration). The second chain's input is a value-distinct
    # tensor so XLA cannot CSE the chains into one.
    points2 = jax.random.uniform(jax.random.PRNGKey(1), points.shape)

    def make_dual(k):
        def run(pa, pb):
            def body(i, acc):
                a, b = lax.optimization_barrier((pa, pb, acc))[:2]
                return acc + fwd(a).sum() + fwd(b).sum()

            return lax.fori_loop(0, k, body, jnp.float32(0))

        return run

    ms = marginal(make_dual, points, points2) * 1e3
    out["dual16"] = {
        "batch_ms": round(ms, 2),
        "clouds_per_sec": round(2 * TOTAL / ms * 1e3, 1),
        "clouds": 2 * TOTAL,
    }
    print(json.dumps({"dual16": out["dual16"]}), flush=True)

    # async2: two in-flight dispatches (no fori loop — host-side pipelining
    # is exactly what the marginal loop hides, so time it wall-clock over
    # many dispatch pairs instead)
    f8 = _jit(fwd)
    a, b = points[:8], points[8:]
    oa = f8(a); ob = f8(b); jax.block_until_ready((oa, ob))  # compile+warm
    reps, iters = 5, 20
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        outs = []
        for _ in range(iters):
            outs.append(f8(a))
            outs.append(f8(b))
        jax.block_until_ready(outs)
        samples.append((time.perf_counter() - t0) / iters)
    samples.sort()
    ms = samples[len(samples) // 2] * 1e3
    out["async2"] = {
        "batch_ms": round(ms, 2),
        "clouds_per_sec": round(TOTAL / ms * 1e3, 1),
    }
    print(json.dumps({"async2": out["async2"]}), flush=True)

    out["xla_lhs"] = "--xla_lhs" in sys.argv
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
