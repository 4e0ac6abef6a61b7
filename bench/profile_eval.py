"""Profile the eval-mode (serving) forward; print per-op device time.

Usage: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
       PYTHONPATH=/root/repo:/root/.axon_site python bench/profile_eval.py
"""
import sys

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo/bench")
from profile_step import parse  # reuse the xplane parser

BATCH, NUM_POINT, NUM_CLASSES, FEAT = 16, 4096, 13, 9


def capture(out_dir):
    from pointnet12_tpu.models import get_model

    model = get_model("pointnet2_semseg", num_classes=NUM_CLASSES)
    key = jax.random.PRNGKey(0)
    points = jax.random.uniform(key, (BATCH, NUM_POINT, FEAT))
    variables = model.init({"params": key}, points[:1], train=False)
    fwd = jax.jit(lambda p: model.apply(variables, p, train=False)[0])
    for _ in range(3):
        out = fwd(points)
    jax.block_until_ready(out)
    jax.profiler.start_trace(out_dir)
    for _ in range(3):
        out = fwd(points)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()


if __name__ == "__main__":
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/prof_eval"
    capture(out_dir)
    parse(out_dir)
