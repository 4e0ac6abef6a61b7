#!/bin/bash
# Round-5 TPU follow-up queue. Waits for tpu_queue.sh (single-client
# relay: NEVER run two TPU processes concurrently — the round-5 first
# queue entry died with UNAVAILABLE when a stray probe touched the chip),
# then:
#   0. re-run the cls_msg_sr seed-0 jax draw lost to that collision
#   1. Mosaic smoke + on-chip A/B for the BN-stats epilogue kernel
#   2. serving occupancy A/B (cross-batch pipelining), plain + LHS flags
#   3. bench.py at HEAD for a mid-round flagship reading
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=bench/qp_r5/tpu_queue2.log

MAIN_PID=$(cat /tmp/tpu_queue.pid 2>/dev/null)
while [ -n "$MAIN_PID" ] && kill -0 "$MAIN_PID" 2>/dev/null; do
  sleep 60
done
echo "[tpu-queue2] $(date +%H:%M:%S) main queue done, starting" >> "$LOG"

python bench/quality_parity.py --platform tpu --jax_only --eval_size 2048 \
  --case cls_msg_sr --seed 0 --batch 8 2>>"$LOG" | tail -1 \
  >> bench/qp_r5/jax_runs.jsonl

echo "[tpu-queue2] $(date +%H:%M:%S) bn_epilogue_ab" >> "$LOG"
python bench/bn_epilogue_ab.py >> bench/qp_r5/bn_epilogue_ab.json 2>>"$LOG"

echo "[tpu-queue2] $(date +%H:%M:%S) serving_overlap_ab" >> "$LOG"
python bench/serving_overlap_ab.py >> bench/qp_r5/serving_overlap.json 2>>"$LOG"
echo "[tpu-queue2] $(date +%H:%M:%S) serving_overlap_ab --xla_lhs" >> "$LOG"
python bench/serving_overlap_ab.py --xla_lhs \
  >> bench/qp_r5/serving_overlap_lhs.json 2>>"$LOG"

echo "[tpu-queue2] $(date +%H:%M:%S) bench.py" >> "$LOG"
python bench.py >> bench/qp_r5/bench_head.json 2>>"$LOG"

echo "[tpu-queue2] ALL DONE $(date +%H:%M:%S)" >> "$LOG"
