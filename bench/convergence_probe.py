"""Reproducible 40-epoch convergence probe for a precision config.

The flagship-promotion quality gate (docs/PERFORMANCE.md): train
pointnet2_semseg on the synthetic seg set at the flagship shape
(B=16, N=4096, 13 classes) to plateau and compare best eval mIoU against
the fp32 plateau (0.535 measured round 3). A config is promotable when it
lands inside the 0.5% BASELINE band. Earlier probes (fp32, bf16_grouped,
bf16_grouped+SR) were ad-hoc CLI invocations recorded in
docs/PERFORMANCE.md; this wraps the same CLI path so future configs run
with one command and print one JSON line.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python bench/convergence_probe.py \
      --config bf16_full_sr [--epoch 40] [--log_dir /tmp/probe_xyz]

Configs mirror the CLI precision flags (cli/common.py):
  fp32          (no flags)
  bf16_grouped  --bf16_grouped --precise_bn 8
  bf16g_sr      --bf16_grouped --bf16_sr --precise_bn 8
  bf16_full_sr  --bf16 --bf16_sr --precise_bn 8   (flagship since its
                probe landed at mIoU 0.5345, 0.0005 from fp32's plateau)
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIG_FLAGS = {
    "fp32": [],
    "bf16_grouped": ["--bf16_grouped", "--precise_bn", "8"],
    "bf16g_sr": ["--bf16_grouped", "--bf16_sr", "--precise_bn", "8"],
    "bf16_full_sr": ["--bf16", "--bf16_sr", "--precise_bn", "8"],
}

FP32_PLATEAU_MIOU = 0.535  # measured round 3, same probe settings


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", choices=sorted(CONFIG_FLAGS), required=True)
    p.add_argument("--epoch", type=int, default=40)
    p.add_argument("--log_dir", default=None)
    p.add_argument("--seed", type=int, default=0,
                   help="init + dropout/SR/FPS rng stream seed — an "
                        "independent draw of the same training process "
                        "(round-5 protocol: seeds {0,1,2} per config, "
                        "mean ± spread in docs/QUALITY_PARITY.md)")
    args = p.parse_args(argv)

    from pointnet12_tpu.cli import train_semseg

    log_dir = args.log_dir or f"/tmp/probe_{args.config}_s{args.seed}"
    cli_argv = [
        "--model_name", "pointnet2",
        "--dataset", "synthetic",
        "--epoch", str(args.epoch),
        "--batchsize", "16",
        "--num_point", "4096",
        "--seed", str(args.seed),
        "--log_dir", log_dir,
    ] + CONFIG_FLAGS[args.config]
    best = train_semseg.main(cli_argv)
    print(
        json.dumps(
            {
                "probe": "convergence",
                "config": args.config,
                "epoch": args.epoch,
                "seed": args.seed,
                "best_eval_miou": round(float(best), 4),
                "fp32_plateau_miou": FP32_PLATEAU_MIOU,
                "delta_vs_fp32": round(FP32_PLATEAU_MIOU - float(best), 4),
                "inside_band": bool(
                    FP32_PLATEAU_MIOU - float(best) <= 0.005
                ),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
