"""Capture a jax.profiler trace of the flagship train step and print per-op
device time, aggregated by HLO op category — the targeting data for kernel
work. Parses the xplane.pb directly (the tensorboard plugin's converter is
broken in this env).

Usage:
  PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
  PYTHONPATH=/root/repo:/root/.axon_site python bench/profile_step.py [out_dir]

Pass --sr to profile the bf16_grouped+SR config (--bf16_grouped --bf16_sr);
pass --full_sr to profile the promoted flagship (--bf16 --bf16_sr, all
train-time casts stochastically rounded). Default is fp32.

Pass --model NAME to profile another zoo config at its BASELINE shape
(e.g. --model pointnet2_cls_msg: B=24, N=1024, cls task — the round-4
MSG per-op profile).
"""

import collections
import glob
import re
import sys

import jax
import jax.numpy as jnp

BATCH, NUM_POINT, NUM_CLASSES, FEAT = 16, 4096, 13, 9


# per-model BASELINE shapes (name -> task, B, N, C, num_classes); the
# flagship keeps its module-level constants, cls models use bench/zoo.py's
SHAPES = {
    "pointnet2_semseg": ("seg", BATCH, NUM_POINT, FEAT, NUM_CLASSES),
    "pointnet_cls": ("cls", 24, 1024, 3, 40),
    "pointnet2_cls_ssg": ("cls", 24, 1024, 3, 40),
    "pointnet2_cls_msg": ("cls", 24, 1024, 3, 40),
    "pointnet_seg": ("seg", 16, 4096, 3, 13),
}


def capture(out_dir, model_kwargs=None, model_name="pointnet2_semseg"):
    from pointnet12_tpu.models import get_model
    from pointnet12_tpu.train import create_train_state, make_optimizer
    from pointnet12_tpu.train.loop import build_train_step

    task, B, N, C, ncls = SHAPES[model_name]
    model = get_model(model_name, num_classes=ncls, **(model_kwargs or {}))
    key = jax.random.PRNGKey(0)
    points = jax.random.uniform(key, (B, N, C))
    labels = (
        jax.random.randint(key, (B,), 0, ncls)
        if task == "cls"
        else jax.random.randint(key, (B, N), 0, ncls)
    )
    batch = {"points": points, "label": labels}
    tx = make_optimizer("adam", steps_per_epoch=100)
    state = create_train_state(model, key, points[:1], tx)
    step = jax.jit(build_train_step(model, task=task, num_classes=ncls))

    for _ in range(3):  # compile + warm
        state, m = step(state, batch, key)
    jax.block_until_ready(m["loss"])

    jax.profiler.start_trace(out_dir)
    for _ in range(3):
        state, m = step(state, batch, key)
    jax.block_until_ready(m["loss"])
    jax.profiler.stop_trace()


def parse(out_dir):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(f"{out_dir}/**/*.xplane.pb", recursive=True)
    assert paths, f"no xplane.pb under {out_dir}"
    xs = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        xs.ParseFromString(f.read())

    for plane in xs.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        print(f"== plane: {plane.name}")
        md = {m.id: m.name for m in plane.event_metadata.values()}
        agg = collections.Counter()
        cnt = collections.Counter()
        cat = collections.Counter()
        for line in plane.lines:
            for ev in line.events:
                name = md.get(ev.metadata_id, "?")
                # async start events span until completion and overlap real
                # compute — their durations double-count; skip them
                if "copy-start" in name or "slice-start" in name or (
                    "async-start" in name
                ):
                    continue
                agg[name] += ev.duration_ps / 1e9  # -> ms
                cnt[name] += 1
                op = name.split("=", 1)[-1].strip().split("(")[0].strip()
                kind = op.split()[-1] if " " in op else op
                m = re.match(r"%([a-zA-Z_\-]+)", name.strip())
                cat[m.group(1) if m else name[:20]] += ev.duration_ps / 1e9
        total = sum(agg.values())
        print(f"total non-async device event ms (3 steps): {total:.2f}")
        print("-- by op-name prefix:")
        for name, ms in cat.most_common(30):
            print(f"{ms:8.3f} ms  {name}")
        print("-- top individual ops:")
        for name, ms in agg.most_common(120):
            print(f"{ms:8.3f} ms  x{cnt[name]:<4d} {name[:140]}")


if __name__ == "__main__":
    args = sys.argv[1:]
    model_name = "pointnet2_semseg"
    if "--model" in args:
        i = args.index("--model")
        model_name = args[i + 1]
        args = args[:i] + args[i + 2 :]
    argv = [a for a in args if a not in ("--sr", "--full_sr")]
    out_dir = argv[0] if argv else "/tmp/prof_step"
    if "--full_sr" in args:
        kw = {"dtype": jnp.bfloat16, "sr": True, "grouped_sr": True}
    elif "--sr" in args:
        kw = {"grouped_dtype": jnp.bfloat16, "grouped_sr": True}
    else:
        kw = None
    capture(out_dir, kw, model_name)
    parse(out_dir)
