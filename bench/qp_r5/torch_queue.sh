#!/bin/bash
# Round-5 multi-seed torch-oracle queue (VERDICT r5 item 1).
# Each run prints one JSON line; appended to torch_runs.jsonl.
cd /root/repo
OUT=bench/qp_r5/torch_runs.jsonl
for spec in \
  "cls_msg_sr 0" "cls_ssg_sr 0" \
  "cls_msg_sr 1" "cls_ssg_sr 1" \
  "cls_msg_sr 2" "cls_ssg_sr 2"; do
  set -- $spec
  case=$1; seed=$2
  if [ "$case" = cls_msg_sr ]; then batch=8; else batch=16; fi
  echo "[queue] $(date +%H:%M:%S) starting $case seed=$seed batch=$batch" >> bench/qp_r5/torch_queue.log
  PYTHONPATH=/root/repo nice -n 10 python bench/quality_parity.py \
    --case "$case" --seed "$seed" --eval_size 2048 --batch "$batch" \
    --torch_only 2>>bench/qp_r5/torch_queue.log | tail -1 >> "$OUT"
  echo "[queue] $(date +%H:%M:%S) done $case seed=$seed" >> bench/qp_r5/torch_queue.log
done
echo "[queue] ALL DONE $(date +%H:%M:%S)" >> bench/qp_r5/torch_queue.log
