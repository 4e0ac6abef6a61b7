"""Aggregate the round-5 multi-seed quality runs into the mean +/- CI
table VERDICT r5 item 1 asks for (docs/QUALITY_PARITY.md).

Reads bench/qp_r5/jax_runs.jsonl (TPU-side draws: bf16_sr promoted config
+ fp32 controls, seeds {0,1,2}) and torch_runs.jsonl (fp32 torch-oracle
draws, same seeds). The comparison is PAIRED per seed: quality_parity.py
seeds the torch init with torch_seed+seed and converts that same init to
the jax side, and both sides see the identical batch order and eval set —
so a per-seed delta cancels init/order/eval-sampling variance, and the
seed-to-seed spread of the deltas is the honest residual noise.

Prints a markdown table plus one JSON line with, per (model, config):
  jax mean/std over seeds, torch mean/std, paired deltas, mean delta,
  delta spread, and two verdicts:
  - symmetric: |mean delta| + SEM(delta) <= 0.005 (literal BASELINE bar)
  - one-sided: mean delta + SEM >= -0.005 (jax not >0.5% BELOW torch —
    the quality bar's intent; beating the oracle is not a failure)
  Both use the matched-protocol eval (running-stats BN on both sides).
  The jax precise-BN number (the shipped --precise_bn eval recipe) is
  reported as its own column for context, not used in the verdicts.

Also prints the convergence-probe spread table (VERDICT r5 item 4) from
probe_runs.jsonl: per config, best_eval_miou mean +/- spread over seeds.

Usage: python bench/qp_r5/summarize.py [--dir bench/qp_r5]
"""

import argparse
import json
import math
import os
import re
import sys
from collections import defaultdict

CASE_RE = re.compile(
    r"^(?P<model>pointnet2_cls_(?:msg|ssg))_"
    r"(?P<kind>torch|(?P<prec>[a-z0-9_]+?))"
    r"(?:_s(?P<seed>\d+))?(?:_jaxonly)?$"
)


def parse(path):
    rows = []
    if not os.path.exists(path):
        return rows
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            try:
                rows.append(json.loads(line))
            except json.JSONDecodeError:
                pass
    return rows


def mean(xs):
    return sum(xs) / len(xs)


def std(xs):
    if len(xs) < 2:
        return 0.0
    m = mean(xs)
    return math.sqrt(sum((x - m) ** 2 for x in xs) / (len(xs) - 1))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dir", default=os.path.dirname(os.path.abspath(__file__)))
    args = p.parse_args(argv)

    jax_rows = parse(os.path.join(args.dir, "jax_runs.jsonl"))
    torch_rows = parse(os.path.join(args.dir, "torch_runs.jsonl"))

    # torch oracle accs keyed by (model, seed)
    torch_acc = {}
    for r in torch_rows:
        m = CASE_RE.match(r["case"])
        if not m or m.group("kind") != "torch":
            continue
        torch_acc[(m.group("model"), int(m.group("seed") or 0))] = (
            r["torch_eval_acc"]
        )

    # jax accs keyed by (model, precision) -> {seed: (acc, pbn_acc)}
    jax_acc = defaultdict(dict)
    for r in jax_rows:
        if "jax_eval_acc" not in r:
            continue
        m = CASE_RE.match(r["case"])
        if not m or m.group("kind") == "torch":
            continue
        key = (m.group("model"), m.group("prec"))
        jax_acc[key][int(m.group("seed") or 0)] = (
            r["jax_eval_acc"],
            r.get("jax_eval_acc_pbn", r["jax_eval_acc"]),
        )

    out = {}
    lines = [
        "| model | config | seeds | jax acc (mean±std) | jax pbn (mean) "
        "| torch acc (mean±std) | paired Δ per seed | mean Δ ± SEM "
        "| symmetric (≤0.005) | one-sided (≥−0.005) |",
        "|---|---|---|---|---|---|---|---|---|---|",
    ]
    for (model, prec), seeds in sorted(jax_acc.items()):
        paired = {
            s: (a, pbn, torch_acc[(model, s)])
            for s, (a, pbn) in sorted(seeds.items())
            if (model, s) in torch_acc
        }
        if not paired:
            continue
        j = [a for a, _, _ in paired.values()]
        jp = [p for _, p, _ in paired.values()]
        t = [b for _, _, b in paired.values()]
        d = [a - b for a, _, b in paired.values()]
        n = len(d)
        sem = std(d) / math.sqrt(n) if n > 1 else float("nan")
        bar = abs(mean(d)) + (sem if n > 1 else 0.0)
        # one-sided: jax may not be >0.5% BELOW torch (worst plausible
        # mean delta, mean - SEM, must clear -0.005); beating torch passes
        one_sided = (mean(d) - (sem if n > 1 else 0.0)) >= -0.005
        row = {
            "model": model,
            "config": prec,
            "seeds": sorted(paired),
            "jax_mean": round(mean(j), 4),
            "jax_std": round(std(j), 4),
            "jax_pbn_mean": round(mean(jp), 4),
            "torch_mean": round(mean(t), 4),
            "torch_std": round(std(t), 4),
            "deltas": [round(x, 4) for x in d],
            "mean_delta": round(mean(d), 4),
            "delta_sem": round(sem, 4) if n > 1 else None,
            "bar_value": round(bar, 4),
            "within_bar": bar <= 0.005,
            "one_sided_pass": one_sided,
        }
        out[f"{model}:{prec}"] = row
        lines.append(
            f"| {model} | {prec} | {row['seeds']} "
            f"| {row['jax_mean']:.4f}±{row['jax_std']:.4f} "
            f"| {row['jax_pbn_mean']:.4f} "
            f"| {row['torch_mean']:.4f}±{row['torch_std']:.4f} "
            f"| {row['deltas']} "
            f"| {row['mean_delta']:+.4f}±{row['delta_sem'] if n > 1 else float('nan'):.4f} "
            f"| {'PASS' if row['within_bar'] else 'FAIL'} ({row['bar_value']:.4f}) "
            f"| {'PASS' if row['one_sided_pass'] else 'FAIL'} |"
        )

    print("\n".join(lines))
    print()

    # ---- distributional view over ALL seeds (incl. unpaired jax extras).
    # The paired protocol hit the probe's trajectory-chaos floor: the
    # torch oracle's own seed spread is ~5 points (MSG s0 0.9355 vs s1
    # 0.9858), the same magnitude as the jax side's, so per-seed pairing
    # cancels nothing and SEM(paired delta) >> 0.005. The honest
    # comparison is between the two DRAW DISTRIBUTIONS: Welch SE of the
    # mean difference + the seed count a 0.5% resolution would need.
    torch_all = defaultdict(list)
    for (model, s), acc in sorted(torch_acc.items()):
        torch_all[model].append(acc)
    dist = {}
    dlines = [
        "| model | config | n_jax | jax mean±std [range] | jax pbn mean "
        "| n_torch | torch mean±std [range] | Δmean ± WelchSE "
        "| seeds/side for 0.5% |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for (model, prec), seeds in sorted(jax_acc.items()):
        j = [a for a, _ in (seeds[s] for s in sorted(seeds))]
        jp = [p for _, p in (seeds[s] for s in sorted(seeds))]
        t = torch_all.get(model, [])
        if not j or len(t) < 2 or len(j) < 2:
            continue
        se = math.sqrt(std(j) ** 2 / len(j) + std(t) ** 2 / len(t))
        # per-side n so that Welch SE (equal n, pooled sigma) <= 0.0025
        # (a 0.5% bar resolved at ~2 SE)
        sigma2 = (std(j) ** 2 + std(t) ** 2) / 2
        n_needed = math.ceil(sigma2 * 2 / 0.0025**2)
        row = {
            "model": model, "config": prec,
            "n_jax": len(j), "jax_mean": round(mean(j), 4),
            "jax_std": round(std(j), 4),
            "jax_pbn_mean": round(mean(jp), 4),
            "jax_range": [round(min(j), 4), round(max(j), 4)],
            "n_torch": len(t), "torch_mean": round(mean(t), 4),
            "torch_std": round(std(t), 4),
            "torch_range": [round(min(t), 4), round(max(t), 4)],
            "dmean": round(mean(j) - mean(t), 4),
            "welch_se": round(se, 4),
            "n_per_side_for_half_pct": n_needed,
        }
        dist[f"{model}:{prec}"] = row
        dlines.append(
            f"| {model} | {prec} | {len(j)} "
            f"| {row['jax_mean']:.4f}±{row['jax_std']:.4f} "
            f"[{row['jax_range'][0]:.4f},{row['jax_range'][1]:.4f}] "
            f"| {row['jax_pbn_mean']:.4f} "
            f"| {len(t)} "
            f"| {row['torch_mean']:.4f}±{row['torch_std']:.4f} "
            f"[{row['torch_range'][0]:.4f},{row['torch_range'][1]:.4f}] "
            f"| {row['dmean']:+.4f}±{se:.4f} "
            f"| {n_needed} |"
        )
    if dist:
        print("\n".join(dlines))
        print()

    # convergence-probe spread table (VERDICT r5 item 4)
    probe_rows = parse(os.path.join(args.dir, "probe_runs.jsonl"))
    by_cfg = defaultdict(dict)
    for r in probe_rows:
        if r.get("probe") == "convergence":
            by_cfg[r["config"]][int(r.get("seed", 0))] = r["best_eval_miou"]
    probes = {}
    if by_cfg:
        plines = [
            "| probe config | seeds | best mIoU per seed | mean ± std | spread |",
            "|---|---|---|---|---|",
        ]
        for cfg, seeds in sorted(by_cfg.items()):
            vals = [seeds[s] for s in sorted(seeds)]
            probes[cfg] = {
                "seeds": sorted(seeds),
                "mious": vals,
                "mean": round(mean(vals), 4),
                "std": round(std(vals), 4),
                "spread": round(max(vals) - min(vals), 4),
            }
            plines.append(
                f"| {cfg} | {sorted(seeds)} | {[f'{v:.4f}' for v in vals]} "
                f"| {mean(vals):.4f}±{std(vals):.4f} "
                f"| {max(vals) - min(vals):.4f} |"
            )
        print("\n".join(plines))
        print()

    # ---- masked-loss case (VERDICT r5 item 7): per-side trajectory
    # draws vs the recorded single-draw delta. jax draws stream into
    # masked_jax_draws.jsonl; oracle draws (2h each on the 1-core box)
    # into masked_torch_draws.jsonl when the queue has run.
    masked = {}
    jd, td = [], []
    for r in parse(os.path.join(args.dir, "masked_jax_draws.jsonl")):
        if "jax_draw" in r:
            jd.append(r["jax_draw"])
        for t in r.get("torch_draws", []):
            td.append(t)
    for r in parse(os.path.join(args.dir, "masked_torch_draws.jsonl")):
        if "torch_draw" in r:
            td.append(r["torch_draw"])
        for t in r.get("torch_draws", []):
            td.append(t)
    # recorded single torch draw from the original paired run
    for r in jax_rows:
        if r.get("case") == "pointnet2_semseg_masked" and "torch_eval_acc" in r:
            td.append({"dropout_seed": "unseeded",
                       "torch_eval_acc": r["torch_eval_acc"],
                       "torch_miou": r["torch_miou"]})
    # dedup oracle draws by seed tag (the unseeded draw may appear twice)
    seen_t, td_u = set(), []
    for t in td:
        tag = t.get("dropout_seed", "unseeded")
        if tag not in seen_t:
            seen_t.add(tag)
            td_u.append(t)
    if jd:
        ja = [x["jax_eval_acc"] for x in jd]
        jm = [x["jax_miou"] for x in jd]
        masked["jax"] = {
            "n": len(jd), "acc_mean": round(mean(ja), 4),
            "acc_spread": round(max(ja) - min(ja), 4),
            "miou_mean": round(mean(jm), 4),
            "miou_spread": round(max(jm) - min(jm), 4),
        }
    if td_u:
        ta = [x["torch_eval_acc"] for x in td_u]
        tm = [x["torch_miou"] for x in td_u]
        masked["torch"] = {
            "n": len(td_u), "acc_mean": round(mean(ta), 4),
            "acc_spread": round(max(ta) - min(ta), 4),
            "miou_mean": round(mean(tm), 4),
            "miou_spread": round(max(tm) - min(tm), 4),
        }
    if jd and td_u:
        masked["delta_acc_mean"] = round(
            mean([x["jax_eval_acc"] for x in jd])
            - mean([x["torch_eval_acc"] for x in td_u]), 4)
        masked["delta_miou_mean"] = round(
            mean([x["jax_miou"] for x in jd])
            - mean([x["torch_miou"] for x in td_u]), 4)
        print(f"masked case: jax n={len(jd)} "
              f"acc {masked['jax']['acc_mean']:.4f} "
              f"(spread {masked['jax']['acc_spread']:.4f}) "
              f"miou {masked['jax']['miou_mean']:.4f} "
              f"(spread {masked['jax']['miou_spread']:.4f}) | "
              f"torch n={len(td_u)} acc {masked['torch']['acc_mean']:.4f} "
              f"(spread {masked['torch']['acc_spread']:.4f}) | "
              f"Δacc {masked['delta_acc_mean']:+.4f} "
              f"Δmiou {masked['delta_miou_mean']:+.4f}")
        print()

    print(json.dumps({"paired_cls": out, "dist_cls": dist,
                      "probes": probes, "masked": masked}))
    return out


if __name__ == "__main__":
    main(sys.argv[1:])
