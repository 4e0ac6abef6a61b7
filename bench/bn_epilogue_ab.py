"""A/B: fused Dense+BN-stats epilogue kernel vs the stock train step
(VERDICT r5 item 5).

Times the FULL flagship train step (pointnet2_semseg, B=16, N=4096,
promoted --bf16 --bf16_sr config, plus the fp32 secondary) with
nn/mlp.py's fused_bn_stats knob off/on. The knob routes every train-mode
Dense+BatchNorm pair (8 grouped + 10 flat at the flagship) through
kernels/bn_stats_fused.py, which accumulates the BN batch moments in
VMEM scratch while the matmul tiles stream — deleting the separate
stat-read pass (measured at the HBM wall, ~0.46 ms/step forward).

Success = a step_ms win outside the ~3% within-pair spread; failure gets
recorded as a dead end in docs/PERFORMANCE.md either way. Uses bench.py's
worse-of-two-compile-draws protocol.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python bench/bn_epilogue_ab.py
"""

import importlib.util
import json
import sys

sys.path.insert(0, "/root/repo")

_spec = importlib.util.spec_from_file_location("bench_root", "/root/repo/bench.py")
_bench_root = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_bench_root)

from pointnet12_tpu.nn import mlp as mlp_lib  # noqa: E402


def main():
    import jax.numpy as jnp

    out = {}
    for name, kwargs in (
        ("bf16_sr", {"dtype": jnp.bfloat16, "sr": True, "grouped_sr": True}),
        ("fp32", {}),
    ):
        row = {}
        for fused in (False, True):
            mlp_lib.set_fused_bn_stats(fused)
            try:
                cps, sec, spread, pair = _bench_root.bench_train_step(
                    model_kwargs=kwargs
                )
            finally:
                mlp_lib.set_fused_bn_stats(False)
            row["fused" if fused else "base"] = {
                "step_ms": round(sec * 1e3, 2),
                "clouds_per_sec": round(cps, 1),
                "pair_ms": [round(p * 1e3, 2) for p in pair],
                "spread": round(spread, 3),
            }
            print(json.dumps({name: row}), flush=True)
        out[name] = row
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
