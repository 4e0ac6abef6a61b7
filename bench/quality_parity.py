"""Long-horizon quality parity vs the torch oracle (VERDICT r3 item 3).

The missing half of the BASELINE quality target (SURVEY.md:209 — eval
accuracy / mIoU within 0.5% of the PyTorch reference): train BOTH stacks
from the SAME init (torch weights through the converter) on the SAME
synthetic data stream to plateau, then compare final eval metrics. Short-
horizon parity (grad parity at init, loss trajectories) lives in
tests/test_train_parity.py; this script is the convergence-level evidence a
dataset-less box can produce, run on CPU so the torch oracle is native.

Bitwise trajectory equality is impossible (fp32 chaos through max-pool
argmax flips — see tests/test_train_parity.py docstring), so the comparison
is statistical: identical data, identical init, identical optimizer
(optax `add_decayed_weights` before `adam` == torch Adam's L2-style
weight_decay), independent dropout RNG; both runs reach their own plateau
and the PLATEAU metrics must agree within the 0.5% target.

Usage (background; ~minutes for cls, tens of minutes for semseg on 1 core):
    PYTHONPATH=/root/repo python bench/quality_parity.py --case cls
    PYTHONPATH=/root/repo python bench/quality_parity.py --case semseg

Prints one JSON line per case; results are recorded in
docs/QUALITY_PARITY.md.
"""

import argparse
import copy
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# --platform tpu: run the JAX side on the real chip (the torch oracle always
# runs native CPU). The comparison is statistical-at-plateau (see module
# docstring), so the JAX platform is free to choose — and for the heavy MSG
# case it is MANDATORY: jax-on-CPU measured ~2 min/step at the case shape
# (round 4), i.e. ~17 h for the 500-step horizon, while the chip does the
# same step in ~10 ms. TPU is also the more faithful platform for the
# promoted bf16+SR config claims (it is where that config actually runs).
# Pre-import hand-parse (argparse runs after the jax import, too late to
# pick the platform). Guarded against --platform being the last token;
# note main(argv) cannot select the platform — only real sys.argv can.
def _platform_from_argv() -> str:
    for i, a in enumerate(sys.argv):
        if a.startswith("--platform="):
            return a.split("=", 1)[1]
        if a == "--platform" and i + 1 < len(sys.argv):
            return sys.argv[i + 1]
    return "cpu"


_PLATFORM = "tpu" if _platform_from_argv() == "tpu" else "cpu"
if _PLATFORM == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"  # axon sitecustomize pins TPU

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

if _PLATFORM == "cpu":
    jax.config.update("jax_platforms", "cpu")

# CPU: exact jnp reference impls (interpret-mode kernels would be slower
# still); TPU: the measured auto-dispatch — the production kernel path.
_IMPL = "jnp" if _PLATFORM == "cpu" else "auto"

from pointnet12_tpu.data.synthetic import SyntheticModelNet, SyntheticScene
from pointnet12_tpu.models import get_model
from pointnet12_tpu.train import losses as losses_lib
from pointnet12_tpu.train.optim import make_optimizer
from pointnet12_tpu.utils.torch_import import CONVERTERS
from tests.torch_ref import models_torch

KEY = jax.random.PRNGKey(0)


def _state_dict_np(tmodel):
    return {
        k: v.numpy()
        for k, v in tmodel.state_dict().items()
        if "num_batches_tracked" not in k
    }


def _batches(dataset, batch_size, n_steps, seed=0):
    """Deterministic shuffled epoch stream of (points, labels) numpy batches
    — the SAME arrays feed both stacks."""
    rng = np.random.RandomState(seed)
    out = []
    order = None
    bi = 0
    nb = len(dataset) // batch_size
    for _ in range(n_steps):
        if order is None or bi >= nb:
            order = rng.permutation(len(dataset))
            bi = 0
        idxs = order[bi * batch_size : (bi + 1) * batch_size]
        pts, lbls = zip(*(dataset[int(i)] for i in idxs))
        out.append((np.stack(pts), np.stack(lbls).astype(np.int64)))
        bi += 1
    return out


# ------------------------------------------------------------------- JAX side


def train_eval_jax(model, variables, batches, eval_pts, eval_lbl, task, lr,
                   wd, precise_bn_batches=0, report_raw=False, rng_seed=0,
                   ignore_class=None):
    """report_raw: additionally return eval preds under the RAW EMA running
    stats (diagnostic: separates a BN-statistics quality effect from a
    trained-weights effect when precise_bn_batches > 0). rng_seed != 0
    perturbs the dropout/SR rng stream (trajectory-noise measurement);
    0 keeps the exact stream all recorded runs used."""
    params, bs = variables["params"], variables["batch_stats"]
    # lr_gamma=1.0: CONSTANT LR, matching the torch side's plain Adam.
    # make_optimizer's default is the reference StepLR recipe, and with
    # this harness's steps_per_epoch default of 1 it decays 0.7x every
    # TWENTY STEPS — a round-4 bug: the jax side's LR was ~0 from step
    # ~400 while torch trained at 1e-3 throughout. The short r3 cases
    # passed anyway (their tasks saturate before the decay bites), but
    # the 1200-step pointnet_seg case froze mid-descent (jax train loss
    # stuck at 0.125 vs torch 0.019, a 1.9% mIoU gap) until this fix.
    tx = make_optimizer("adam", learning_rate=lr, weight_decay=wd,
                        lr_gamma=1.0)
    opt = tx.init(params)

    @jax.jit
    def step(params, bs, opt, key, pts, lbl):
        def loss_fn(p):
            (logp, trans), mut = model.apply(
                {"params": p, "batch_stats": bs},
                pts,
                train=True,
                fps_key=None,
                mutable=["batch_stats"],
                rngs={"dropout": key},
            )
            if task == "cls":
                loss = losses_lib.classification_loss(logp, lbl, trans)
            else:
                # KITTI-style --ignore_class masking: unlabeled points
                # excluded from the NLL mean (== torch ignore_index)
                mask = (lbl != ignore_class) if ignore_class is not None \
                    else None
                loss = losses_lib.segmentation_loss(logp, lbl, trans,
                                                    mask=mask)
            return loss, mut["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params
        )
        updates, new_opt = tx.update(grads, opt, params)
        return optax_apply(params, updates), new_bs, new_opt, loss

    import optax

    def optax_apply(p, u):
        return optax.apply_updates(p, u)

    base_key = KEY if rng_seed == 0 else jax.random.fold_in(KEY, rng_seed)
    for i, (pts, lbl) in enumerate(batches):
        key = jax.random.fold_in(base_key, i)
        params, bs, opt, loss = step(
            params, bs, opt, key, jnp.asarray(pts), jnp.asarray(lbl)
        )
        if i % 50 == 0:
            print(f"  [jax] step {i} loss {float(loss):.4f}", flush=True)

    # eval-mode forward (running BN stats, no dropout), batched
    @jax.jit
    def fwd(params, bs, pts):
        logp, _ = model.apply(
            {"params": params, "batch_stats": bs}, pts, train=False
        )
        return jnp.argmax(logp, axis=-1)

    def run_eval(bs_eval):
        preds = []
        B = batches[0][0].shape[0]
        for s in range(0, len(eval_pts), B):
            chunk = eval_pts[s : s + B]
            pad = B - len(chunk)
            if pad:
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], pad, 0)]
                )
            p = np.asarray(fwd(params, bs_eval, jnp.asarray(chunk)))
            preds.append(p[: len(chunk) - pad] if pad else p)
        return np.concatenate(preds)

    raw_preds = run_eval(bs) if report_raw else None
    if precise_bn_batches:
        # bf16 configs eval with exact pooled statistics instead of the
        # lagging EMA (train/precise_bn.py; the documented --precise_bn
        # pairing for --bf16_grouped/--bf16_sr)
        from types import SimpleNamespace

        from pointnet12_tpu.train.precise_bn import recompute_batch_stats

        shim = SimpleNamespace(
            apply_fn=model.apply, params=params, batch_stats=bs,
            replace=lambda **kw: kw["batch_stats"],
        )
        bs = recompute_batch_stats(
            shim,
            [{"points": p} for p, _ in batches[-precise_bn_batches:]],
            precise_bn_batches,
        )
        preds = run_eval(bs)
    else:
        preds = raw_preds if raw_preds is not None else run_eval(bs)
    if report_raw:
        return preds, float(loss), raw_preds
    return preds, float(loss)


# ----------------------------------------------------------------- torch side


def train_eval_torch(tmodel, batches, eval_pts, eval_lbl, task, lr, wd,
                     channels_first, ignore_class=None):
    tmodel.train()
    optim = torch.optim.Adam(
        tmodel.parameters(), lr=lr, weight_decay=wd
    )
    ignore = -100 if ignore_class is None else ignore_class
    for i, (pts, lbl) in enumerate(batches):
        optim.zero_grad()
        t_in = torch.from_numpy(pts)
        if channels_first:
            t_in = t_in.permute(0, 2, 1)
        logp, trans = tmodel(t_in)
        loss = F.nll_loss(
            logp.reshape(-1, logp.shape[-1]),
            torch.from_numpy(lbl).long().reshape(-1),
            ignore_index=ignore,
        )
        if trans is not None:
            # UN-squared mean Frobenius norm — the lineage's typo'd
            # `feature_transform_reguliarzer` (SURVEY.md:69) computes
            # torch.mean(torch.norm(...)) with no square, matching
            # losses_lib.feature_transform_regularizer. A round-4 bug here
            # (** 2 on the norm) had the two stacks optimizing DIFFERENT
            # objectives: for norm>1 the squared form pins the T-Net to
            # orthogonality much harder, and the first pointnet_seg run
            # (1200 steps, feature_transform=True) landed 1.9% apart in
            # mIoU with the torch side training 0.1 lower in loss.
            d = trans.shape[-1]
            eye = torch.eye(d)[None]
            loss = loss + 1e-3 * torch.mean(
                torch.norm(torch.bmm(trans, trans.transpose(2, 1)) - eye,
                           dim=(1, 2))
            )
        loss.backward()
        optim.step()
        if i % 50 == 0:
            print(f"  [torch] step {i} loss {float(loss.detach()):.4f}",
                  flush=True)
    tmodel.eval()
    preds = []
    with torch.no_grad():
        # eval-mode BN/dropout are per-sample deterministic, so the chunk
        # size is free — 64 amortizes the op overheads on the 2048-sample
        # round-5 eval sets (vs chunking by the train batch).
        B = max(batches[0][0].shape[0], 64)
        for s in range(0, len(eval_pts), B):
            chunk = torch.from_numpy(eval_pts[s : s + B])
            if channels_first:
                chunk = chunk.permute(0, 2, 1)
            logp, _ = tmodel(chunk)
            preds.append(logp.argmax(-1).numpy())
    return np.concatenate(preds), float(loss.detach())


# -------------------------------------------------------------------- metrics


def miou_of(preds, labels, num_classes, ignore_class=None):
    """Per-class IoU mean; with ignore_class, unlabeled points are
    excluded from every intersection/union and the ignored class is
    dropped from the mean (the --ignore_class eval semantics,
    train/metrics.py::iou_from_confusion)."""
    labeled = (labels != ignore_class) if ignore_class is not None else \
        np.ones_like(labels, bool)
    ious = []
    for c in range(num_classes):
        if ignore_class is not None and c == ignore_class:
            continue
        inter = np.sum((preds == c) & (labels == c) & labeled)
        union = np.sum(((preds == c) | (labels == c)) & labeled)
        if union > 0:
            ious.append(inter / union)
    return float(np.mean(ious))


# PointNet-1 precision variants (no grouped stacks to scope to — plain
# dtype/sr only; see cli/common.py::model_precision_kwargs).
_PN1_PRECISIONS = {
    "fp32": {},
    "bf16": {"dtype": jnp.bfloat16},
    "bf16_sr": {"dtype": jnp.bfloat16, "sr": True},
}


def run_cls(n_steps, hard=False, precision="fp32", jax_only=False):
    """``hard=True``: 24 classes at N=96 points — the task stops saturating
    (plateau ~0.9), so a real quality gap between the stacks would be
    visible in the final accuracy rather than hidden at 100%.

    precision/jax_only: PointNet-1 precision probes (the fp32 torch oracle
    is deterministic given the fixed seeds, so the recorded fp32 run's
    torch numbers are reusable for jax-only bf16 variants)."""
    num_classes, N, B = (24, 96, 24) if hard else (8, 256, 24)
    train_ds = SyntheticModelNet("train", num_point=N,
                                 num_classes=num_classes, size=512)
    test_ds = SyntheticModelNet("test", num_point=N,
                                num_classes=num_classes, size=256)
    batches = _batches(train_ds, B, n_steps)
    eval_pts = np.stack([test_ds[i][0] for i in range(len(test_ds))])
    eval_lbl = np.asarray([int(test_ds[i][1]) for i in range(len(test_ds))])

    torch.manual_seed(0)
    tmodel = models_torch.PointNetCls(num_classes=num_classes)
    variables = CONVERTERS["pointnet_cls"](_state_dict_np(tmodel))
    model = get_model("pointnet_cls", num_classes=num_classes,
                      **_PN1_PRECISIONS[precision])

    jp, jloss = train_eval_jax(
        model, variables, batches, eval_pts, eval_lbl, "cls", 1e-3, 1e-4,
        precise_bn_batches=0 if precision == "fp32" else 8,
    )
    jacc = float(np.mean(jp == eval_lbl))
    case = "pointnet_cls_hard" if hard else "pointnet_cls"
    if precision != "fp32":
        case += "_" + precision
    if jax_only:
        return {
            "case": case + "_jaxonly",
            "steps": n_steps,
            "jax_eval_acc": jacc,
            "jax_final_train_loss": jloss,
        }
    tp, tloss = train_eval_torch(tmodel, batches, eval_pts, eval_lbl,
                                 "cls", 1e-3, 1e-4, channels_first=True)
    tacc = float(np.mean(tp == eval_lbl))
    return {
        "case": case,
        "steps": n_steps,
        "jax_eval_acc": jacc, "torch_eval_acc": tacc,
        "delta": abs(jacc - tacc),
        "jax_final_train_loss": jloss, "torch_final_train_loss": tloss,
        "within_target": abs(jacc - tacc) <= 0.005,
    }


# Precision-variant kwargs for the PointNet++ cls cases. "bf16_sr" is the
# promoted flagship config (--bf16 --bf16_sr); the others exist to BISECT a
# quality failure: "bf16" isolates plain round-to-nearest, "bf16g_sr"
# isolates the grouped-stack casts (dtype stays fp32 outside the SA
# grouped tensors), "fp32" is the no-cast control.
_PRECISIONS = {
    "fp32": {},
    "bf16": {"dtype": jnp.bfloat16},
    "bf16_sr": {"dtype": jnp.bfloat16, "sr": True, "grouped_sr": True},
    "bf16g_sr": {"grouped_dtype": jnp.bfloat16, "grouped_sr": True},
    # bf16 OUTSIDE the grouped stacks only (group-all SharedMLP + the
    # inter-SA output casts run bf16; the grouped (B,S,K,C) stacks are
    # pinned fp32) — the complement of bf16g_sr, for locating a failure.
    "bf16ng": {"dtype": jnp.bfloat16, "grouped_dtype": jnp.float32},
}


def _run_pn2_cls(model_name, torch_seed, n_steps, precision, jax_only=False,
                 data_seed=0, eval_size=256, seed=0, torch_only=False,
                 batch=16):
    """Shared runner for the PointNet++ classification quality cases.

    24 classes at N=512 (the cls models' minimum: SA1 samples 512 centers)
    keeps the task off the 100% ceiling. Sizing note (measured): a first
    attempt at size=256/128 and 300 steps was NOT a plateau comparison —
    the torch side overfit the tiny train set (train loss 0.21 vs 0.42)
    while SR's quantization noise regularized the JAX side, landing jax
    0.875 vs torch 0.727. Larger sets + longer horizon let both stacks
    reach a real plateau.

    jax_only / torch_only: run one side only. The fp32 torch oracle is
    fully determined by (torch_seed+seed, the batch stream) — one torch
    run's numbers pair with every jax-side precision variant at the same
    seed. torch_only exists so the CPU-bound oracle runs (the multi-seed
    protocol's long pole, VERDICT r5 item 1) can be farmed out to
    background processes while the jax draws run on the chip.

    data_seed: perturb the batch ORDER and the jax dropout/SR rng stream
    (init and data content unchanged) — an independent trajectory draw of
    the same training process, for measuring the jax side's own
    seed-to-seed spread without paying for a torch rerun.

    seed: a FULL independent draw of the comparison — perturbs the torch
    init (torch_seed+seed) and the batch order + jax rng stream together.
    The round-5 multi-seed protocol runs seeds {0,1,2} per side and
    reports mean ± spread (docs/QUALITY_PARITY.md).

    eval_size: eval-set size. The round-4 runs used 256 (binomial 1-sigma
    ~1.3% at p~0.95 — too coarse for the 0.5% bar); the round-5 protocol
    uses 2048 (1-sigma <= 0.45%).
    """
    num_classes, N, B = 24, 512, batch
    train_ds = SyntheticModelNet("train", num_point=N,
                                 num_classes=num_classes, size=512)
    test_ds = SyntheticModelNet("test", num_point=N,
                                num_classes=num_classes, size=eval_size)
    order_seed = data_seed if data_seed else seed
    batches = _batches(train_ds, B, n_steps, seed=order_seed)
    eval_pts = np.stack([test_ds[i][0] for i in range(len(test_ds))])
    eval_lbl = np.asarray([int(test_ds[i][1]) for i in range(len(test_ds))])

    torch.manual_seed(torch_seed + seed)
    tcls = (models_torch.PointNet2ClsMsg if model_name == "pointnet2_cls_msg"
            else models_torch.PointNet2ClsSsg)
    tmodel = tcls(num_classes=num_classes)
    case = model_name + "_" + precision
    if data_seed:
        case += f"_ds{data_seed}"
    if seed:
        case += f"_s{seed}"
    if torch_only:
        tp, tloss = train_eval_torch(tmodel, batches, eval_pts, eval_lbl,
                                     "cls", 1e-3, 1e-4, channels_first=False)
        return {
            "case": model_name + f"_torch_s{seed}",
            "steps": n_steps, "eval_size": eval_size,
            "torch_eval_acc": float(np.mean(tp == eval_lbl)),
            "torch_final_train_loss": tloss,
        }
    variables = CONVERTERS[model_name](_state_dict_np(tmodel))
    kw = _PRECISIONS[precision]
    model = get_model(model_name, num_classes=num_classes, impl=_IMPL, **kw)

    # precise-BN stats are always recomputed so every run reports BOTH eval
    # accs (EMA running stats vs exact pooled stats) — the pair separates
    # "BN statistics quality" from "trained weights quality" for free. The
    # headline jax_eval_acc stays config-appropriate: pbn for the bf16
    # variants (the documented --precise_bn pairing), raw EMA for fp32
    # (the CLI default), identical to what earlier recorded runs reported.
    jp, jloss, jp_raw = train_eval_jax(
        model, variables, batches, eval_pts, eval_lbl, "cls", 1e-3, 1e-4,
        precise_bn_batches=8, report_raw=True,
        rng_seed=order_seed,
    )
    jacc_pbn = float(np.mean(jp == eval_lbl))
    jacc_raw = float(np.mean(jp_raw == eval_lbl))
    jacc = jacc_raw if precision == "fp32" else jacc_pbn
    if jax_only:
        return {
            "case": case + "_jaxonly",
            "steps": n_steps, "eval_size": eval_size,
            "jax_eval_acc": jacc,
            "jax_eval_acc_ema": jacc_raw,
            "jax_eval_acc_pbn": jacc_pbn,
            "jax_final_train_loss": jloss,
        }
    tp, tloss = train_eval_torch(tmodel, batches, eval_pts, eval_lbl,
                                 "cls", 1e-3, 1e-4, channels_first=False)
    tacc = float(np.mean(tp == eval_lbl))
    return {
        "case": case,
        "steps": n_steps, "eval_size": eval_size,
        "jax_eval_acc": jacc, "torch_eval_acc": tacc,
        "jax_eval_acc_ema": jacc_raw, "jax_eval_acc_pbn": jacc_pbn,
        "delta": abs(jacc - tacc),
        "jax_final_train_loss": jloss, "torch_final_train_loss": tloss,
        "within_target": abs(jacc - tacc) <= 0.005,
    }


def run_cls_ssg(n_steps, sr=True, jax_only=False, precision=None,
                data_seed=0, eval_size=256, seed=0, torch_only=False,
                batch=16):
    """PointNet++ SSG classification under the production precision config
    (--bf16 --bf16_sr --precise_bn) vs the fp32 torch oracle — the
    cls-side companion of the semseg_sr case."""
    return _run_pn2_cls("pointnet2_cls_ssg", 2, n_steps,
                        precision or ("bf16_sr" if sr else "fp32"),
                        jax_only, data_seed, eval_size, seed, torch_only,
                        batch)


def run_cls_msg(n_steps, sr=True, jax_only=False, precision=None,
                data_seed=0, eval_size=256, seed=0, torch_only=False,
                batch=16):
    """PointNet++ MSG classification under the promoted precision config
    (--bf16 --bf16_sr, +precise-BN eval) vs the fp32 torch oracle
    (VERDICT r4 item 5b). MSG is the model with the MOST grouped-SR cast
    sites (3 radius branches per SA level x 2 MSG levels), so the promoted
    config's quality claim cannot be transferred from the SSG case — it
    has to be measured on this topology. N=512 is the model's minimum
    (SA1 samples 512 centers)."""
    return _run_pn2_cls("pointnet2_cls_msg", 3, n_steps,
                        precision or ("bf16_sr" if sr else "fp32"),
                        jax_only, data_seed, eval_size, seed, torch_only,
                        batch)


def run_pointnet_seg(n_steps, seed=0):
    """PointNet-1 segmentation (BASELINE config 2 — the last config with
    no convergence-level evidence, VERDICT r4 item 5c) vs the torch
    oracle, fp32 both sides (the reference config). feature_transform=True
    exercises the 64x64 T-Net + regularizer exactly as the reference's
    seg training does.

    Sizing note (measured): 240 steps — enough for pointnet2_semseg's
    run_semseg — is NOT a plateau here: init loss/grads match to 5e-7 /
    corr 0.99999 (same oracle, /tmp-scale check, round 4), but this
    model's global 1024-point max + two T-Nets make the early trajectory
    chaotic, and at step 240 one stack had converged (0.99 acc) while the
    other was still descending (loss 0.40 and falling, acc 0.56). The
    default horizon is therefore 1200 steps so BOTH stacks reach the
    task's plateau before comparing."""
    num_classes, N, B = 6, 1024, 4
    train_ds = SyntheticScene("train", num_point=N,
                              num_classes=num_classes, size=128)
    test_ds = SyntheticScene("test", num_point=N,
                             num_classes=num_classes, size=32)
    batches = _batches(train_ds, B, n_steps, seed=seed)
    eval_pts = np.stack([test_ds[i][0] for i in range(len(test_ds))])
    eval_lbl = np.stack([test_ds[i][1] for i in range(len(test_ds))])

    torch.manual_seed(4 + seed)
    # SyntheticScene yields 9-channel points (xyz + rgb + normalized xyz)
    tmodel = models_torch.PointNetSeg(
        num_classes=num_classes, feature_transform=True, channel=9
    )
    variables = CONVERTERS["pointnet_seg"](
        _state_dict_np(tmodel), feature_transform=True
    )
    model = get_model(
        "pointnet_seg", num_classes=num_classes, feature_transform=True
    )

    jp, jloss = train_eval_jax(model, variables, batches, eval_pts, eval_lbl,
                               "seg", 1e-3, 1e-4)
    tp, tloss = train_eval_torch(tmodel, batches, eval_pts, eval_lbl,
                                 "seg", 1e-3, 1e-4, channels_first=True)
    jacc = float(np.mean(jp == eval_lbl))
    tacc = float(np.mean(tp == eval_lbl))
    jmiou = miou_of(jp.ravel(), eval_lbl.ravel(), num_classes)
    tmiou = miou_of(tp.ravel(), eval_lbl.ravel(), num_classes)
    return {
        "case": "pointnet_seg",
        "seed": seed,
        "steps": n_steps,
        "jax_eval_acc": jacc, "torch_eval_acc": tacc,
        "jax_miou": jmiou, "torch_miou": tmiou,
        "delta_acc": abs(jacc - tacc), "delta_miou": abs(jmiou - tmiou),
        "jax_final_train_loss": jloss, "torch_final_train_loss": tloss,
        "within_target": abs(jacc - tacc) <= 0.005
        and abs(jmiou - tmiou) <= 0.005,
    }


def run_semseg(n_steps, sr=False):
    num_classes, N, B = 6, 1024, 4
    train_ds = SyntheticScene("train", num_point=N,
                              num_classes=num_classes, size=128)
    test_ds = SyntheticScene("test", num_point=N,
                             num_classes=num_classes, size=32)
    batches = _batches(train_ds, B, n_steps)
    eval_pts = np.stack([test_ds[i][0] for i in range(len(test_ds))])
    eval_lbl = np.stack([test_ds[i][1] for i in range(len(test_ds))])

    torch.manual_seed(1)
    tmodel = models_torch.PointNet2SemSeg(num_classes=num_classes, channel=9)
    variables = CONVERTERS["pointnet2_semseg"](_state_dict_np(tmodel))
    # sr: the production speed config (--bf16 --bf16_sr --precise_bn,
    # the promoted flagship) against the UNCHANGED fp32 torch oracle —
    # the direct quality-parity statement for the fast config.
    kw = {"dtype": jnp.bfloat16, "sr": True, "grouped_sr": True} if sr else {}
    model = get_model(
        "pointnet2_semseg", num_classes=num_classes, impl=_IMPL, **kw
    )

    jp, jloss = train_eval_jax(model, variables, batches, eval_pts, eval_lbl,
                               "seg", 1e-3, 1e-4,
                               precise_bn_batches=8 if sr else 0)
    tp, tloss = train_eval_torch(tmodel, batches, eval_pts, eval_lbl,
                                 "seg", 1e-3, 1e-4, channels_first=False)
    jacc = float(np.mean(jp == eval_lbl))
    tacc = float(np.mean(tp == eval_lbl))
    jmiou = miou_of(jp.ravel(), eval_lbl.ravel(), num_classes)
    tmiou = miou_of(tp.ravel(), eval_lbl.ravel(), num_classes)
    return {
        "case": "pointnet2_semseg" + ("_bf16_sr" if sr else ""),
        "steps": n_steps,
        "jax_eval_acc": jacc, "torch_eval_acc": tacc,
        "jax_miou": jmiou, "torch_miou": tmiou,
        "delta_acc": abs(jacc - tacc), "delta_miou": abs(jmiou - tmiou),
        "jax_final_train_loss": jloss, "torch_final_train_loss": tloss,
        "within_target": abs(jacc - tacc) <= 0.005
        and abs(jmiou - tmiou) <= 0.005,
    }


def run_semseg_masked(n_steps, sr=False, jax_draws=1, torch_draws=1,
                      torch_only=False):
    """KITTI-style masked-loss convergence parity (VERDICT r4 item 7):
    pointnet2_semseg with --ignore_class 0 at 20 classes. SyntheticScene's
    class 0 (the floor, ~1/3 of the points) plays the unlabeled class, so
    the mask is load-bearing: a weighting bug in the masked NLL mean or
    the masked mIoU would move the plateau visibly. torch side uses
    F.nll_loss(ignore_index=0) — the reference's masking; metrics exclude
    unlabeled points and drop class 0 from the IoU mean on both sides.

    jax_draws > 1: train the jax side that many times with perturbed
    dropout/SR rng streams (same init, same batches — the torch run is
    shared) and report every draw. The per-draw spread is the probe's own
    trajectory noise: the round-5 single-draw run landed delta 1.7%/1.8%
    (acc/mIoU), and whether that clears or flags the 0.5% bar depends on
    comparing it against this spread.

    torch_draws > 1: symmetric noise measurement on the ORACLE side —
    retrain the same seed-5 init that many times with a perturbed torch
    dropout stream (manual_seed(1000+d) before training; draw 0 keeps the
    historical unseeded stream so it reproduces the recorded run). The
    jax-draw spread alone cannot attribute a delta: if torch's own draws
    spread comparably and straddle the jax band, the delta is trajectory
    noise, not a framework gap.

    torch_draws == 0: skip the oracle entirely (it costs ~2h on this
    1-core box while a jax TPU draw is minutes) and emit only the jax
    draws; deltas are computed against the recorded oracle run when the
    caller passes it in the environment via run_semseg_masked's JSON
    consumer (summarize against torch_runs/masked_torch_draws)."""
    num_classes, N, B, ignore = 20, 1024, 4, 0
    train_ds = SyntheticScene("train", num_point=N,
                              num_classes=num_classes, size=128)
    test_ds = SyntheticScene("test", num_point=N,
                             num_classes=num_classes, size=32)
    batches = _batches(train_ds, B, n_steps)
    eval_pts = np.stack([test_ds[i][0] for i in range(len(test_ds))])
    eval_lbl = np.stack([test_ds[i][1] for i in range(len(test_ds))])

    torch.manual_seed(5)
    tmodel = models_torch.PointNet2SemSeg(num_classes=num_classes, channel=9)
    variables = CONVERTERS["pointnet2_semseg"](_state_dict_np(tmodel))
    kw = {"dtype": jnp.bfloat16, "sr": True, "grouped_sr": True} if sr else {}
    model = get_model(
        "pointnet2_semseg", num_classes=num_classes, impl=_IMPL, **kw
    )

    labeled = eval_lbl != ignore
    draws = []
    for d in range(0 if torch_only else jax_draws):
        jp, jloss = train_eval_jax(model, variables, batches, eval_pts,
                                   eval_lbl, "seg", 1e-3, 1e-4,
                                   precise_bn_batches=8 if sr else 0,
                                   ignore_class=ignore, rng_seed=d)
        draws.append({
            "rng_seed": d,
            "jax_eval_acc": float(np.mean((jp == eval_lbl)[labeled])),
            "jax_miou": miou_of(jp.ravel(), eval_lbl.ravel(),
                                num_classes, ignore),
            "jax_final_train_loss": jloss,
        })
        if jax_draws > 1:  # stream: a killed run keeps finished draws
            print(json.dumps({"case": "pointnet2_semseg_masked",
                              "jax_draw": draws[-1]}), flush=True)
    tdraws = []
    for d in range(torch_draws):
        tm = copy.deepcopy(tmodel)
        if d > 0:
            torch.manual_seed(1000 + d)
        tp, tl = train_eval_torch(tm, batches, eval_pts, eval_lbl,
                                  "seg", 1e-3, 1e-4, channels_first=False,
                                  ignore_class=ignore)
        tdraws.append({
            "dropout_seed": "unseeded" if d == 0 else 1000 + d,
            "torch_eval_acc": float(np.mean((tp == eval_lbl)[labeled])),
            "torch_miou": miou_of(tp.ravel(), eval_lbl.ravel(),
                                  num_classes, ignore),
            "torch_final_train_loss": tl,
        })
        if torch_draws > 1:  # stream: a killed run keeps finished draws
            print(json.dumps({"case": "pointnet2_semseg_masked",
                              "torch_draw": tdraws[-1]}), flush=True)
    out = {
        "case": "pointnet2_semseg_masked" + ("_bf16_sr" if sr else ""),
        "steps": n_steps, "ignore_class": ignore,
        "labeled_frac": float(np.mean(labeled)),
    }
    if tdraws:
        tacc, tmiou = tdraws[0]["torch_eval_acc"], tdraws[0]["torch_miou"]
        tloss = tdraws[0]["torch_final_train_loss"]
        out.update({
            "torch_eval_acc": tacc, "torch_miou": tmiou,
            "torch_final_train_loss": tloss,
        })
    if draws and tdraws:
        jacc, jmiou = draws[0]["jax_eval_acc"], draws[0]["jax_miou"]
        jloss = draws[0]["jax_final_train_loss"]
        out.update({
            "jax_eval_acc": jacc, "jax_miou": jmiou,
            "jax_final_train_loss": jloss,
            "delta_acc": abs(jacc - tacc), "delta_miou": abs(jmiou - tmiou),
            "within_target": abs(jacc - tacc) <= 0.005
            and abs(jmiou - tmiou) <= 0.005,
        })
    elif draws:  # torch_draws == 0: jax-only emission, no deltas
        out.update({
            "jax_eval_acc": draws[0]["jax_eval_acc"],
            "jax_miou": draws[0]["jax_miou"],
            "jax_final_train_loss": draws[0]["jax_final_train_loss"],
        })
    if jax_draws > 1:
        out["jax_draws"] = draws
        accs = [x["jax_eval_acc"] for x in draws]
        mious = [x["jax_miou"] for x in draws]
        out["jax_acc_spread"] = max(accs) - min(accs)
        out["jax_miou_spread"] = max(mious) - min(mious)
    if torch_draws > 1:
        out["torch_draws"] = tdraws
        taccs = [x["torch_eval_acc"] for x in tdraws]
        tmious = [x["torch_miou"] for x in tdraws]
        out["torch_acc_spread"] = max(taccs) - min(taccs)
        out["torch_miou_spread"] = max(tmious) - min(tmious)
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument(
        "--case",
        choices=["cls", "cls_hard", "cls_ssg_sr", "cls_msg_sr",
                 "cls_msg_fp32", "pointnet_seg", "semseg", "semseg_sr",
                 "semseg_masked"],
        required=True,
    )
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--jax_only", action="store_true",
                   help="cls_ssg/cls_msg cases: skip the torch oracle and "
                        "report only the jax metrics (the fp32 oracle is "
                        "deterministic given the seed, so a prior run's "
                        "torch numbers are reusable)")
    p.add_argument("--precision", choices=sorted(_PRECISIONS),
                   default=None,
                   help="cls_ssg/cls_msg cases: override the case's default "
                        "precision config (bisect knob; see _PRECISIONS)")
    p.add_argument("--data_seed", type=int, default=0,
                   help="cls_ssg/cls_msg cases: perturb batch order + jax "
                        "rng stream — an independent trajectory draw for "
                        "noise-floor measurement (pair with --jax_only)")
    p.add_argument("--seed", type=int, default=0,
                   help="perturb init + batch order: both stacks re-run as "
                        "an independent draw of the same training process "
                        "(pointnet_seg and, round 5, the cls_ssg/cls_msg "
                        "multi-seed protocol)")
    p.add_argument("--torch_only", action="store_true",
                   help="cls_ssg/cls_msg cases: run ONLY the torch oracle "
                        "(for farming the CPU-bound side out to background "
                        "processes; pair with a --jax_only run at the same "
                        "--seed/--steps/--eval_size/--batch)")
    p.add_argument("--eval_size", type=int, default=256,
                   help="cls_ssg/cls_msg eval-set size (round-5 protocol "
                        "uses 2048: binomial 1-sigma <= 0.45%%)")
    p.add_argument("--jax_draws", type=int, default=1,
                   help="semseg_masked: extra jax-side trainings with "
                        "perturbed rng streams (shared torch run) — "
                        "measures the probe's own trajectory noise")
    p.add_argument("--torch_draws", type=int, default=1,
                   help="semseg_masked: torch-side trainings from the same "
                        "seed-5 init with perturbed dropout streams (draw 0 "
                        "keeps the historical unseeded stream) — the "
                        "oracle's own trajectory noise; with --torch_only "
                        "the jax side is skipped entirely")
    p.add_argument("--batch", type=int, default=16,
                   help="cls_ssg/cls_msg train batch size (both stacks)")
    p.add_argument("--platform", choices=["cpu", "tpu"], default="cpu",
                   help="JAX-side platform (parsed pre-import at module "
                        "top; the torch oracle always runs native CPU)")
    args = p.parse_args(argv)
    torch.set_num_threads(1)  # 1-core box; avoid thrash with the jax run
    if args.case == "cls":
        out = run_cls(args.steps or 1500,
                      precision=args.precision or "fp32",
                      jax_only=args.jax_only)
    elif args.case == "cls_hard":
        out = run_cls(args.steps or 2000, hard=True,
                      precision=args.precision or "fp32",
                      jax_only=args.jax_only)
    elif args.case == "cls_ssg_sr":
        out = run_cls_ssg(args.steps or 800, jax_only=args.jax_only,
                          precision=args.precision,
                          data_seed=args.data_seed,
                          eval_size=args.eval_size, seed=args.seed,
                          torch_only=args.torch_only, batch=args.batch)
    elif args.case == "cls_msg_sr":
        out = run_cls_msg(args.steps or 500, jax_only=args.jax_only,
                          precision=args.precision,
                          data_seed=args.data_seed,
                          eval_size=args.eval_size, seed=args.seed,
                          torch_only=args.torch_only, batch=args.batch)
    elif args.case == "cls_msg_fp32":
        out = run_cls_msg(args.steps or 500, sr=False,
                          jax_only=args.jax_only,
                          precision=args.precision,
                          data_seed=args.data_seed,
                          eval_size=args.eval_size, seed=args.seed,
                          torch_only=args.torch_only, batch=args.batch)
    elif args.case == "pointnet_seg":
        out = run_pointnet_seg(args.steps or 1200, seed=args.seed)
    elif args.case == "semseg_masked":
        out = run_semseg_masked(args.steps or 240,
                                jax_draws=args.jax_draws,
                                torch_draws=args.torch_draws,
                                torch_only=args.torch_only)
    else:
        out = run_semseg(args.steps or 240, sr=args.case == "semseg_sr")
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
