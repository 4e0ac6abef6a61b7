"""Trace-backed closure of the serving occupancy question (VERDICT r5
item 2): is there idle device time during the mono B=16 eval forward
that a second independent chain could fill?

Captures jax.profiler traces of (a) the mono B=16 eval forward and
(b) the dual16 program (two independent B=16 chains in one jitted
program, the deconfounded occupancy test from serving_overlap_ab.py),
then reports, per device-plane line: busy time (sum of non-async event
durations), span (last end - first start), and busy fraction.

Reading: if mono's main op lane is ~100% busy over its span, the 5.33 ms
floor is DEVICE-BUSY, not scheduling bubbles — there is no idle unit
time for cross-batch overlap to reclaim, and serving_overlap_ab's
dual16 ≈ 2x mono wall is architectural (one TensorCore executes one HLO
at a time; MXU/VPU/gather phases are phases WITHIN serialized ops, not
independently schedulable units at the HLO level).

Usage: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
       PYTHONPATH=/root/repo:/root/.axon_site python bench/overlap_trace.py
"""

import collections
import glob
import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

NUM_POINT, NUM_CLASSES, FEAT, B = 4096, 13, 9, 16
REPS = 5


def capture(out_dir, dual):
    from pointnet12_tpu.models import get_model

    model = get_model("pointnet2_semseg", num_classes=NUM_CLASSES)
    key = jax.random.PRNGKey(0)
    pa = jax.random.uniform(key, (B, NUM_POINT, FEAT))
    pb = jax.random.uniform(jax.random.PRNGKey(1), pa.shape)
    variables = model.init({"params": key}, pa[:1], train=False)

    def fwd(p):
        return model.apply(variables, p, train=False)[0]

    if dual:
        f = jax.jit(lambda a, b: (fwd(a).sum() + fwd(b).sum()))
        args = (pa, pb)
    else:
        f = jax.jit(lambda a: fwd(a).sum())
        args = (pa,)

    for _ in range(3):
        out = f(*args)
    jax.block_until_ready(out)
    jax.profiler.start_trace(out_dir)
    for _ in range(REPS):
        out = f(*args)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()


def analyze(out_dir):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(f"{out_dir}/**/*.xplane.pb", recursive=True)
    assert paths, f"no xplane.pb under {out_dir}"
    xs = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        xs.ParseFromString(f.read())

    out = {}
    for plane in xs.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        md = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            busy = 0.0
            lo, hi = None, None
            n = 0
            for ev in line.events:
                name = md.get(ev.metadata_id, "?")
                if "copy-start" in name or "slice-start" in name or (
                    "async-start" in name
                ):
                    continue
                s, d = ev.offset_ps, ev.duration_ps
                busy += d / 1e9
                lo = s if lo is None else min(lo, s)
                hi = s + d if hi is None else max(hi, s + d)
                n += 1
            if n == 0 or hi == lo:
                continue
            span = (hi - lo) / 1e9
            out[f"{plane.name}/{line.name}"] = {
                "events": n,
                "busy_ms": round(busy, 3),
                "span_ms": round(span, 3),
                "busy_frac": round(busy / span, 4),
                "busy_ms_per_rep": round(busy / REPS, 3),
            }
    return out


if __name__ == "__main__":
    res = {}
    for tag, dual in (("mono", False), ("dual16", True)):
        d = f"/tmp/overlap_trace_{tag}"
        capture(d, dual)
        res[tag] = analyze(d)
        print(json.dumps({tag: res[tag]}, indent=1), flush=True)
    print(json.dumps(res), flush=True)
