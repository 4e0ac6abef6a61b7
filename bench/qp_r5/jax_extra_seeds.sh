#!/bin/bash
# Round-5 addendum: extra UNPAIRED jax-side seeds (3..7) for both cls
# models x {bf16_sr, fp32}. The paired 3-seed protocol hit the probe's
# trajectory-chaos floor (torch s0 0.9355 vs s1 0.9858 — the ORACLE's own
# seed spread is ~5%), so per-seed pairing cancels nothing; the honest
# comparison is distributional, and jax draws are ~100x cheaper than
# torch draws (minutes on TPU vs ~2h on the 1-core oracle). n=8 jax
# draws vs n=3 torch draws tightens the jax side of that comparison.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=bench/qp_r5/jax_runs.jsonl
LOG=bench/qp_r5/continuation_queue.log

run_qp () {
  echo "[extra] $(date +%H:%M:%S) qp $*" >> "$LOG"
  nice -n 12 python bench/quality_parity.py --platform tpu --jax_only \
    --eval_size 2048 "$@" 2>>"$LOG" | tail -1 >> "$OUT"
}

for seed in 3 4 5 6 7; do
  run_qp --case cls_msg_sr --seed "$seed" --batch 8
  run_qp --case cls_msg_sr --precision fp32 --seed "$seed" --batch 8
  run_qp --case cls_ssg_sr --seed "$seed" --batch 16
  run_qp --case cls_ssg_sr --precision fp32 --seed "$seed" --batch 16
done
echo "[extra] ALL DONE $(date +%H:%M:%S)" >> "$LOG"
