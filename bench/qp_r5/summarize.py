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
  delta spread, and the bar verdict |mean delta| + SEM(delta) <= 0.005.

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

    # jax accs keyed by (model, precision) -> {seed: acc}
    jax_acc = defaultdict(dict)
    for r in jax_rows:
        if "jax_eval_acc" not in r:
            continue
        m = CASE_RE.match(r["case"])
        if not m or m.group("kind") == "torch":
            continue
        key = (m.group("model"), m.group("prec"))
        jax_acc[key][int(m.group("seed") or 0)] = r["jax_eval_acc"]

    out = {}
    lines = [
        "| model | config | seeds | jax acc (mean±std) | torch acc (mean±std) "
        "| paired Δ per seed | mean Δ ± SEM | bar (≤0.005) |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for (model, prec), seeds in sorted(jax_acc.items()):
        paired = {
            s: (a, torch_acc[(model, s)])
            for s, a in sorted(seeds.items())
            if (model, s) in torch_acc
        }
        if not paired:
            continue
        j = [a for a, _ in paired.values()]
        t = [b for _, b in paired.values()]
        d = [a - b for a, b in paired.values()]
        n = len(d)
        sem = std(d) / math.sqrt(n) if n > 1 else float("nan")
        bar = abs(mean(d)) + (sem if n > 1 else 0.0)
        row = {
            "model": model,
            "config": prec,
            "seeds": sorted(paired),
            "jax_mean": round(mean(j), 4),
            "jax_std": round(std(j), 4),
            "torch_mean": round(mean(t), 4),
            "torch_std": round(std(t), 4),
            "deltas": [round(x, 4) for x in d],
            "mean_delta": round(mean(d), 4),
            "delta_sem": round(sem, 4) if n > 1 else None,
            "bar_value": round(bar, 4),
            "within_bar": bar <= 0.005,
        }
        out[f"{model}:{prec}"] = row
        lines.append(
            f"| {model} | {prec} | {row['seeds']} "
            f"| {row['jax_mean']:.4f}±{row['jax_std']:.4f} "
            f"| {row['torch_mean']:.4f}±{row['torch_std']:.4f} "
            f"| {row['deltas']} "
            f"| {row['mean_delta']:+.4f}±{row['delta_sem'] if n > 1 else float('nan'):.4f} "
            f"| {'PASS' if row['within_bar'] else 'FAIL'} ({row['bar_value']:.4f}) |"
        )

    print("\n".join(lines))
    print()
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main(sys.argv[1:])
