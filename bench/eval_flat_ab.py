"""Same-process A/B: eval (serving) forward with the grouped MLP chain on
the stock 4-D layout vs the flat (B, S*K, C) view (nn/mlp.py::EVAL_FLAT_MLP).

Motivation: the round-4 eval profile shows ~0.5 ms/step of {3,2,1,0} ->
{1,3,2,0} relayout copies on the gathered grouped tensors (copy.50
f32[16,1024,32,32] 0.43 ms + copy.57). In EVAL, BN is folded into the
matmul columns, so nothing needs the grouped layout until the final K-max
— the flat view may let XLA keep row-major end to end. (Train flattening
is a measured +8.5 ms dead end; this knob is eval-only.)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python bench/eval_flat_ab.py
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

BATCH, NUM_POINT, NUM_CLASSES, FEAT = 16, 4096, 13, 9


def run():
    import numpy as np

    from pointnet12_tpu.models import get_model
    from pointnet12_tpu.nn import mlp as mlp_mod

    model = get_model("pointnet2_semseg", num_classes=NUM_CLASSES)
    key = jax.random.PRNGKey(0)
    points = jax.random.uniform(key, (BATCH, NUM_POINT, FEAT))
    variables = model.init({"params": key}, points[:1], train=False)

    def make_looped(k):
        def runner(pts):
            def body(i, acc):
                lp, _ = model.apply(variables, pts + acc * 0, train=False)
                return acc + lp[0, 0, 0]

            return lax.fori_loop(0, k, body, jnp.float32(0))

        return runner

    out = {}
    for flat in (False, True, False):  # repeat base to anchor draw variance
        mlp_mod.EVAL_FLAT_MLP = flat
        # logit parity first (reshapes are exact; this guards wiring bugs)
        want = np.asarray(
            jax.jit(lambda p: model.apply(variables, p, train=False)[0])(points)
        )
        if "want0" not in out:
            out["want0"] = want
        else:
            out.setdefault("max_logit_delta", 0.0)
            out["max_logit_delta"] = max(
                out["max_logit_delta"],
                float(np.max(np.abs(want - out["want0"]))),
            )
        s1, _ = _marginal_time(make_looped, points)
        s2, _ = _marginal_time(make_looped, points, short=3, long=13)
        out.setdefault("ms", []).append(
            (("flat" if flat else "base"), round(s1 * 1e3, 2), round(s2 * 1e3, 2))
        )
        jax.clear_caches()
    del out["want0"]
    print(json.dumps(out))


if __name__ == "__main__":
    run()
