"""Microbenchmark: BN batch-stat computation strategies vs the HBM wall
(VERDICT r4 item 4 — the 1.39 ms/step "BN convert_reduce" attack).

The train step's BN stat work is, per layer, one fused pass over the bf16
activation (convert->f32, sibling mean/mean-of-square reduces) in forward
plus two reduce reads (sum g, sum g*xhat) in backward. Candidate from the
verdict: compute the sums as MXU ones-vector contractions on the bf16
tensor with f32 accumulation instead of the VPU convert_reduce.

This micro times, on the REAL flagship BN shapes (all 22 train-mode BN
inputs of pointnet2_semseg at B=16, N=4096):

  a) xla_reduce  — jitted (mean, mean(x^2)) exactly as flax BN computes
  b) mxu_ones    — dot_general(ones, x) f32-accum for the sum; the square
                   half still needs x*x (materialization cost shows up)
  c) hbm_floor   — bytes/819e9 (v5e HBM) pencil line for comparison

If (a) is at/near (c), the convert_reduce item is a bandwidth wall and no
contraction rewrite can beat it — the honest outcome is a dead-end entry.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python bench/bn_stats_ab.py
"""

import importlib.util
import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax

_spec = importlib.util.spec_from_file_location("bench_root", "/root/repo/bench.py")
_bench_root = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_bench_root)
_marginal_time = _bench_root._marginal_time

B, N = 16, 4096

# every train-mode BN input of pointnet2_semseg at the flagship shape:
# (rows..., C). SA grouped stacks (B, S, K, C), FP/head flat (B, N, C).
SHAPES = (
    [(B, 1024, 32, c) for c in (32, 32, 64)]
    + [(B, 256, 32, c) for c in (64, 64, 128)]
    + [(B, 64, 32, c) for c in (128, 128, 256)]
    + [(B, 16, 32, c) for c in (256, 256, 512)]
    + [(B, 64, 256), (B, 64, 256)]      # fp4
    + [(B, 256, 256), (B, 256, 256)]    # fp3
    + [(B, 1024, 256), (B, 1024, 128)]  # fp2
    + [(B, 4096, 128)] * 3              # fp1
    + [(B, 4096, 128)]                  # head bn1
)


def make_inputs():
    key = jax.random.PRNGKey(0)
    return [
        jax.random.normal(jax.random.fold_in(key, i), s, jnp.bfloat16)
        for i, s in enumerate(SHAPES)
    ]


def stats_xla(x):
    """flax nn.BatchNorm's train-mode stat computation (dtype=fp32 on a
    bf16 input): convert + sibling mean / mean-of-square reduces."""
    axes = tuple(range(x.ndim - 1))
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=axes)
    mean2 = jnp.mean(xf * xf, axis=axes)
    return mean, mean2 - mean * mean


def stats_mxu(x):
    """MXU ones-vector contraction with f32 accumulation (the verdict's
    candidate). The square half contracts x with itself channel-batched
    is NOT MXU-shaped, so it squares elementwise first — whether XLA
    fuses that into the dot operand decides the traffic."""
    axes = tuple(range(x.ndim - 1))
    r = 1.0
    for a in axes:
        r *= x.shape[a]
    ones = jnp.ones(x.shape[:-1], jnp.bfloat16)
    s = lax.dot_general(
        ones, x, (((tuple(range(x.ndim - 1)), axes)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s2 = lax.dot_general(
        ones, x * x, (((tuple(range(x.ndim - 1)), axes)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    mean = s / r
    return mean, s2 / r - mean * mean


def run():
    xs = make_inputs()
    total_bytes = sum(2 * int(jnp.prod(jnp.array(s))) for s in SHAPES)

    out = {
        "n_tensors": len(SHAPES),
        "total_mb_bf16": round(total_bytes / 1e6, 1),
        "hbm_floor_ms_819gbs": round(total_bytes / 819e9 * 1e3, 3),
    }

    for tag, fn in (("xla_reduce", stats_xla), ("mxu_ones", stats_mxu)):
        def make_looped(k, fn=fn):
            def runner(*inputs):
                def body(i, acc):
                    # anti-hoist, third attempt (each prior one measured
                    # an impossible 0.12 ms for 337 MB of reads):
                    #   1. `x + acc * 0` — XLA folds mul-by-zero and
                    #      hoists the loop-invariant stats;
                    #   2. `x + bump(acc)` — stats are AFFINE in the
                    #      input, so the simplifier distributes the
                    #      reduce over the broadcast-add and hoists
                    #      mean(x)/mean(x^2) anyway.
                    # An optimization_barrier tying x to the loop carry is
                    # variant (can't hoist) and opaque (can't distribute),
                    # and costs zero ops.
                    tot = acc
                    for x in inputs:
                        xb, _ = lax.optimization_barrier((x, acc))
                        m, v = fn(xb)
                        # consume EVERY channel — `m[0]` alone lets XLA
                        # slice the reduction to channel 0.
                        tot = tot + jnp.sum(m) + jnp.sum(v)
                    return tot

                return lax.fori_loop(0, k, body, jnp.float32(0))

            return runner

        # 100-iteration loops: at the default long=12 the ~4 ms
        # long-short difference sits inside relay noise and best-of-reps
        # UNDERestimates (three runs read an impossible 0.13 ms for
        # 337 MB of reads; a direct 4-vs-104 wall clock measured 0.42).
        s1, _ = _marginal_time(
            make_looped, *xs, short=4, long=104, stat="median"
        )
        s2, _ = _marginal_time(
            make_looped, *xs, short=2, long=102, stat="median"
        )
        out[f"{tag}_ms_draws"] = [round(s1 * 1e3, 3), round(s2 * 1e3, 3)]
        out[f"{tag}_ms_worse"] = round(max(s1, s2) * 1e3, 3)
        jax.clear_caches()

    out["xla_vs_floor"] = round(
        out["xla_reduce_ms_worse"] / out["hbm_floor_ms_819gbs"], 2
    )
    print(json.dumps(out))


if __name__ == "__main__":
    run()
