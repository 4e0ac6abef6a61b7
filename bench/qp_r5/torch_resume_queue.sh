#!/bin/bash
# Round-5 torch-oracle RESUME queue (after the 2026-08-20 ~21:20 reboot
# killed torch_queue.sh mid cls_msg_sr seed=1). Seed-0 results for both
# models are already in torch_runs.jsonl; this drains the remaining
# seeds CHEAPEST-FIRST (ssg ~1.3h, msg ~2.2h on this 1-core box) so a
# session cut-off loses the least. Each completed run streams one JSON
# line; incomplete runs leave no partial line.
cd /root/repo
OUT=bench/qp_r5/torch_runs.jsonl
LOG=bench/qp_r5/torch_queue.log
for spec in \
  "cls_ssg_sr 1 16" "cls_ssg_sr 2 16" \
  "cls_msg_sr 1 8" "cls_msg_sr 2 8"; do
  set -- $spec
  case=$1; seed=$2; batch=$3
  echo "[resume] $(date +%H:%M:%S) starting $case seed=$seed batch=$batch" >> "$LOG"
  PYTHONPATH=/root/repo nice -n 10 python bench/quality_parity.py \
    --case "$case" --seed "$seed" --eval_size 2048 --batch "$batch" \
    --torch_only 2>>"$LOG" | tail -1 >> "$OUT"
  echo "[resume] $(date +%H:%M:%S) done $case seed=$seed" >> "$LOG"
done
echo "[resume] ALL DONE $(date +%H:%M:%S)" >> "$LOG"
