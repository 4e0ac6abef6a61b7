"""Benchmark harness — the two north-star numbers (BASELINE.json:2).

Measures on the real chip:
  1. clouds/sec/chip for PointNet++ SSG semantic-seg forward+backward+update
     (B=16, N=4096 points, 9-dim features, 13 classes) — the primary metric.
  2. FPS + ball-query Pallas-kernel microseconds per 4096-point cloud.

Methodology: host-side wall clocks are unreliable on this box (the axon
relay adds large, variable per-call latencies — observed 0.02 ms to 90 ms
for identical work). So every measurement runs the workload K times INSIDE
one compiled program (``lax.scan``/``fori_loop``) and reports the marginal
time between a short and a long loop: fixed dispatch/transfer overhead
cancels exactly, leaving pure device time.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

vs_baseline: ratio against V100_REF_CLOUDS_PER_SEC, an engineering estimate
of the pure-PyTorch reference on a single V100 (BASELINE.json records no
published numbers; reference mount empty — SURVEY.md §0/§6). The estimate is
deliberately GENEROUS to the reference: its FPS alone is ~1360 sequential
CUDA launches per cloud per forward (SURVEY.md §3.2), bounding it to ~100
clouds/sec at B=16 before the MLPs even run. Target is >=10x
[BASELINE.json:5].
"""

import functools
import json
import time

import jax
import jax.numpy as jnp
from jax import lax

V100_REF_CLOUDS_PER_SEC = 100.0  # documented estimate, see module docstring

BATCH = 16
NUM_POINT = 4096
NUM_CLASSES = 13
FEAT_DIM = 9
SHORT, LONG = 2, 12


def _marginal_time(
    make_looped, *args, reps=5, short=SHORT, long=LONG, stat="best"
):
    """Device seconds per iteration: (t_long - t_short) / (long - short).

    Returns ``(value, spread)``: the best-of-reps (or median, for
    small-kernel loops where relay noise between the paired runs can push
    individual samples below the true device time — min-of-reps then
    UNDERestimates) plus the relative spread ``(max - min) / median``
    across reps, so round-over-round deltas are attributable against the
    box's ~±20% run-to-run variance.
    """
    f_short = jax.jit(make_looped(short))
    f_long = jax.jit(make_looped(long))

    def run(f):
        out = f(*args)
        # force full materialization through the relay
        return float(jnp.asarray(jax.tree.leaves(out)[0], jnp.float32).ravel()[0])

    run(f_short), run(f_long)  # compile + warm
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        run(f_short)
        t_short = time.perf_counter() - t0
        t0 = time.perf_counter()
        run(f_long)
        t_long = time.perf_counter() - t0
        samples.append((t_long - t_short) / (long - short))
    samples.sort()
    med = samples[len(samples) // 2]
    value = med if stat == "median" else samples[0]
    spread = (samples[-1] - samples[0]) / max(med, 1e-12)
    return value, spread


def bench_train_step(model_kwargs=None, draws=2):
    from pointnet12_tpu.models import get_model
    from pointnet12_tpu.train import create_train_state, make_optimizer
    from pointnet12_tpu.train.loop import build_train_step

    model = get_model(
        "pointnet2_semseg", num_classes=NUM_CLASSES, **(model_kwargs or {})
    )
    key = jax.random.PRNGKey(0)
    points = jax.random.uniform(key, (BATCH, NUM_POINT, FEAT_DIM))
    labels = jax.random.randint(key, (BATCH, NUM_POINT), 0, NUM_CLASSES)
    batch = {"points": points, "label": labels}

    tx = make_optimizer("adam", steps_per_epoch=100)
    state0 = create_train_state(model, key, points[:1], tx)
    raw_step = build_train_step(model, task="seg", num_classes=NUM_CLASSES)

    def make_looped(k):
        def run(state, batch):
            def body(carry, _):
                st, _m = raw_step(carry, batch, key)
                return st, _m["loss"]

            final, losses = lax.scan(body, state, None, length=k)
            return losses[-1]

        return run

    # two independently-compiled loop pairs expose XLA's per-compile fusion
    # draw (observed 15.5-16.2 ms across identical-code processes, while
    # within-pair spread is ~3%). Round 3 (VERDICT weak #1): report BOTH
    # draws and make the headline the WORSE one — the honest number a
    # deployment sees without compile-draw luck.
    sec, spread = _marginal_time(make_looped, state0, batch)
    if draws == 1:
        return BATCH / sec, sec, spread, [sec]
    sec2, spread2 = _marginal_time(
        make_looped, state0, batch, short=SHORT + 1, long=LONG + 1
    )
    pair = sorted([sec, sec2])
    worse = pair[-1]
    return BATCH / worse, worse, max(spread, spread2), pair


def bench_inference(model_kwargs=None):
    """Eval-mode forward clouds/sec (the serving metric)."""
    from pointnet12_tpu.models import get_model

    model = get_model(
        "pointnet2_semseg", num_classes=NUM_CLASSES, **(model_kwargs or {})
    )
    key = jax.random.PRNGKey(0)
    points = jax.random.uniform(key, (BATCH, NUM_POINT, FEAT_DIM))
    variables = model.init({"params": key}, points[:1], train=False)

    def make_looped(k):
        def run(points):
            def body(i, acc):
                lp, _ = model.apply(variables, points + acc * 0, train=False)
                return acc + lp[0, 0, 0]

            return lax.fori_loop(0, k, body, jnp.float32(0))

        return run

    sec, _ = _marginal_time(make_looped, points)
    return BATCH / sec, sec


def bench_kernels():
    from pointnet12_tpu.kernels.ballquery_pallas import ballquery_pallas
    from pointnet12_tpu.kernels.fps_pallas import fps_pallas
    from pointnet12_tpu.ops.ballquery import query_ball_point
    from pointnet12_tpu.ops.gather import index_points

    key = jax.random.PRNGKey(1)
    xyz = jax.random.uniform(key, (BATCH, NUM_POINT, 3))
    start = jnp.zeros((BATCH,), jnp.int32)
    npoint, nsample, radius = 1024, 32, 0.1
    new_xyz = jax.jit(index_points)(xyz, fps_pallas(xyz, npoint, start))

    def fps_looped(k):
        def run(xyz, new_xyz):
            def body(i, acc):
                idx = fps_pallas(xyz + acc * 0, npoint, start)
                return acc + idx[0, 0].astype(jnp.float32)

            return lax.fori_loop(0, k, body, jnp.float32(0))

        return run

    def bq_looped(k):
        # production dispatch (impl="auto"): the bitmask kernel at this shape
        def run(xyz, new_xyz):
            def body(i, acc):
                idx = query_ball_point(radius, nsample, xyz + acc * 0, new_xyz)
                return acc + idx[0, 0, 0].astype(jnp.float32)

            return lax.fori_loop(0, k, body, jnp.float32(0))

        return run

    def bq_dense_looped(k):
        def run(xyz, new_xyz):
            def body(i, acc):
                idx = ballquery_pallas(radius, nsample, xyz + acc * 0, new_xyz)
                return acc + idx[0, 0, 0].astype(jnp.float32)

            return lax.fori_loop(0, k, body, jnp.float32(0))

        return run

    # sub-ms kernels: stretch the loops hard AND take the median — relay
    # jitter (several ms) between the paired short/long runs otherwise
    # biases a min-of-reps estimate toward zero.
    t_fps, _ = _marginal_time(
        fps_looped, xyz, new_xyz, short=2, long=122, stat="median"
    )
    t_bq, _ = _marginal_time(
        bq_looped, xyz, new_xyz, short=2, long=62, stat="median"
    )
    t_bqd, _ = _marginal_time(
        bq_dense_looped, xyz, new_xyz, short=2, long=62, stat="median"
    )
    return t_fps / BATCH * 1e6, t_bq / BATCH * 1e6, t_bqd / BATCH * 1e6


def verify_kernels():
    """Compiled-on-TPU kernel correctness at flagship shapes (VERDICT #3).

    Runs each Mosaic-compiled Pallas kernel AND its exact jnp twin on the
    real chip and counts index mismatches, excluding query rows with any
    point within fp tolerance of the radius boundary (expansion-form vs
    direct-form distances legitimately disagree there — same masking as
    tests/test_kernels.py). Returns a dict of mismatch counts; all-zero
    means the Mosaic lowering is faithful.
    """
    import numpy as np

    from pointnet12_tpu.kernels.ballquery_bitmask import ballquery_bitmask
    from pointnet12_tpu.kernels.ballquery_grid import ballquery_grid
    from pointnet12_tpu.kernels.ballquery_pallas import ballquery_pallas
    from pointnet12_tpu.kernels.fps_pallas import fps_pallas
    from pointnet12_tpu.kernels.threenn_pallas import three_nn_pallas
    from pointnet12_tpu.ops.ballquery import _ballquery_jnp
    from pointnet12_tpu.ops.fps import _fps_jnp
    from pointnet12_tpu.ops.gather import index_points
    from pointnet12_tpu.ops.interpolate import three_nn

    key = jax.random.PRNGKey(3)
    xyz = jax.random.uniform(key, (BATCH, NUM_POINT, 3))
    start = jnp.zeros((BATCH,), jnp.int32)
    npoint, nsample, radius = 1024, 32, 0.1

    out = {}
    fps_p = np.asarray(fps_pallas(xyz, npoint, start))
    fps_j = np.asarray(_fps_jnp(xyz, npoint, start))
    out["fps"] = int((fps_p != fps_j).sum())

    new_xyz = index_points(xyz, jnp.asarray(fps_j))
    bq_j = np.asarray(_ballquery_jnp(radius, nsample, xyz, new_xyz))
    bq_p = np.asarray(ballquery_pallas(radius, nsample, xyz, new_xyz))
    bq_g = np.asarray(ballquery_grid(radius, nsample, xyz, new_xyz))
    bq_b = np.asarray(ballquery_bitmask(radius, nsample, xyz, new_xyz))
    d2 = np.sum(
        (np.asarray(new_xyz)[:, :, None, :] - np.asarray(xyz)[:, None]) ** 2,
        -1,
    )
    ok = ~np.any(np.abs(d2 - radius**2) < 1e-5, axis=-1)  # (B, S)
    out["ballquery"] = int((bq_p != bq_j)[ok].sum())
    out["ballquery_grid"] = int((bq_g != bq_j)[ok].sum())
    out["ballquery_bitmask"] = int((bq_b != bq_j)[ok].sum())

    # MSG-shaped case: wider radius, K=64, S=512 (the branch shapes the
    # cls-MSG model hits; round-1 verification only covered SSG shapes)
    new_xyz_msg = index_points(xyz, jnp.asarray(fps_j[:, :512]))
    bqm_j = np.asarray(_ballquery_jnp(0.4, 64, xyz, new_xyz_msg))
    bqm_p = np.asarray(ballquery_pallas(0.4, 64, xyz, new_xyz_msg))
    bqm_b = np.asarray(ballquery_bitmask(0.4, 64, xyz, new_xyz_msg))
    d2m = np.sum(
        (np.asarray(new_xyz_msg)[:, :, None, :] - np.asarray(xyz)[:, None])
        ** 2,
        -1,
    )
    okm = ~np.any(np.abs(d2m - 0.4**2) < 1e-5, axis=-1)
    out["ballquery_msg"] = int((bqm_p != bqm_j)[okm].sum())
    out["ballquery_msg_bitmask"] = int((bqm_b != bqm_j)[okm].sum())

    # chunked-packing bitmask shape (N > 4096 -> n_chunk slabs; the round-3
    # dispatch extension routes such shapes to the bitmask kernel when the
    # grid kernel's S % 128 alignment fails)
    xyz_big = jax.random.uniform(jax.random.PRNGKey(5), (4, 8192, 3))
    q_big = xyz_big[:, ::64, :]  # 128 centers
    bqc_j = np.asarray(_ballquery_jnp(0.12, 16, xyz_big, q_big))
    bqc_b = np.asarray(ballquery_bitmask(0.12, 16, xyz_big, q_big))
    d2c = np.sum(
        (np.asarray(q_big)[:, :, None, :] - np.asarray(xyz_big)[:, None])
        ** 2,
        -1,
    )
    okc = ~np.any(np.abs(d2c - 0.12**2) < 1e-5, axis=-1)
    out["ballquery_bitmask_chunked"] = int((bqc_b != bqc_j)[okc].sum())

    d_j, i_j = three_nn(xyz, new_xyz, impl="jnp")
    d_p, i_p = three_nn_pallas(xyz, new_xyz)
    # exclude rows with ANY near-tie among the 4 nearest distances: ties
    # legitimately permute the returned slots between the two distance
    # formulations — both internal (slot swaps among the top 3; observed
    # with slot-distance error 2e-7) and at the 3rd/4th boundary. Distance
    # VALUES still agree to ~1e-6 (asserted via three_nn_dist_maxerr).
    dq = np.sum(
        (np.asarray(xyz)[:, :, None, :] - np.asarray(new_xyz)[:, None]) ** 2,
        -1,
    )  # (B, N, M): three_nn finds each xyz point's 3 NN among new_xyz
    dq = np.sort(dq, axis=-1)[..., :4]
    gap_ok = np.min(np.diff(dq, axis=-1), axis=-1) > 1e-6
    out["three_nn_idx"] = int((np.asarray(i_p) != np.asarray(i_j))[gap_ok].sum())
    out["three_nn_dist_maxerr"] = float(
        np.max(np.abs(np.asarray(d_p) - np.asarray(d_j)))
    )
    return out


def _wait_for_backend(attempts=6, sleep_s=180, probe_timeout_s=240):
    """Retry TPU backend init: the axon tunnel on this box has transient
    outages (observed: init raises UNAVAILABLE *or hangs indefinitely*).

    A hang cannot be recovered in-process (backend init is not
    interruptible), so each attempt first probes in a SUBPROCESS under a
    hard timeout; only after a probe succeeds does the in-process init
    run (the tunnel can still die inside that small window, but the
    multi-hour-outage case no longer wedges the benchmark). A failed init
    is cached inside jax, so backends are cleared between tries."""
    import subprocess
    import sys as _sys

    probe_src = (
        "import jax, jax.numpy as jnp; "
        "jax.block_until_ready(jnp.zeros((8,)) + 1)"
    )
    for i in range(attempts):
        probe_ok = False
        try:
            probe_ok = (
                subprocess.run(
                    [_sys.executable, "-c", probe_src],
                    timeout=probe_timeout_s,
                    capture_output=True,
                ).returncode
                == 0
            )
        except subprocess.TimeoutExpired:
            pass  # hung init — exactly the case the subprocess guards
        if probe_ok:
            try:
                jax.block_until_ready(jnp.zeros((8,)) + 1)
                return
            except Exception as e:  # noqa: BLE001 — init errors vary
                if i == attempts - 1:
                    raise
                print(
                    f"# backend init failed ({type(e).__name__}) after a "
                    f"good probe, retry {i + 1}/{attempts - 1}",
                    flush=True,
                )
        elif i == attempts - 1:
            raise RuntimeError(
                f"TPU backend unreachable after {attempts} probes "
                f"({probe_timeout_s}s timeout each, {sleep_s}s apart)"
            )
        else:
            print(
                f"# backend probe {i + 1}/{attempts} failed/hung, "
                f"retry in {sleep_s}s",
                flush=True,
            )
        try:
            jax.clear_caches()
            jax.extend.backend.clear_backends()
        except Exception:  # noqa: BLE001
            pass
        time.sleep(sleep_s)


def main(argv=None):
    import sys

    argv = sys.argv[1:] if argv is None else argv
    _wait_for_backend()
    if "--verify" in argv:  # standalone detailed verification run
        print(json.dumps({"kernel_verify": verify_kernels()}))
        return

    # Headline config (round 3): --bf16 --bf16_sr — ALL train-time bf16
    # casts (SA grouped stacks + FP decoder + head) STOCHASTICALLY
    # ROUNDED, paired with --precise_bn for eval. Quality evidence
    # (docs/PERFORMANCE.md + docs/QUALITY_PARITY.md): 40-epoch
    # flagship-shape probe reaches mIoU 0.5345 vs fp32's 0.535 (0.0005,
    # inside the 0.5% BASELINE band; bf16_grouped+SR reached 0.5328 and
    # is ~1 ms/step slower; plain round-to-nearest bf16 configs stay
    # demoted — deterministic rounding bias costs real plateau quality).
    clouds_per_sec, sec_per_step, spread, draws = bench_train_step(
        model_kwargs={
            "dtype": jnp.bfloat16,
            "sr": True,
            "grouped_sr": True,
        }
    )
    # secondary: the fully-fp32 config (previous headline), still tracked
    # so precision-policy regressions stay visible round over round.
    fp32_cps, fp32_sec, _, fp32_draws = bench_train_step()
    infer_cps, _ = bench_inference()
    fps_us, bq_us, bq_dense_us = bench_kernels()
    verify = verify_kernels()
    result = {
        "metric": "clouds/sec/chip PointNet++ SSG semseg fwd+bwd "
                  "(B=16, N=4096, full-bf16 + stochastic rounding)",
        "value": round(clouds_per_sec, 2),
        "unit": "clouds/sec",
        "vs_baseline": round(clouds_per_sec / V100_REF_CLOUDS_PER_SEC, 3),
        "step_ms": round(sec_per_step * 1e3, 2),
        "step_ms_draws": [round(d * 1e3, 2) for d in draws],
        "spread": round(spread, 3),
        "headline_config": "--bf16 --bf16_sr (+--precise_bn at eval); "
                           "quality: 40-epoch probe mIoU 0.5345 vs "
                           "fp32 0.535 — docs/PERFORMANCE.md",
        "fp32_step_ms": round(fp32_sec * 1e3, 2),
        "fp32_step_ms_draws": [round(d * 1e3, 2) for d in fp32_draws],
        "fp32_clouds_per_sec": round(fp32_cps, 2),
        "inference_clouds_per_sec": round(infer_cps, 2),
        "fps_us_per_cloud": round(fps_us, 1),
        "ballquery_us_per_cloud": round(bq_us, 1),
        "ballquery_dense_us_per_cloud": round(bq_dense_us, 1),
        "fps_ballquery_us_per_cloud": round(fps_us + bq_us, 1),
        "kernel_verify": verify,
        "device": str(jax.devices()[0]),
        "batch": BATCH,
        "num_point": NUM_POINT,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
