#!/bin/bash
# Round-5 follow-up TPU queue: runs after master_queue.sh exits.
# 1. serving_overlap_ab --xla_lhs rerun (the XLA_FLAGS form was fatal on
#    this libtpu; now passed via jax.jit compiler_options)
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=bench/qp_r5/followup_queue.log
MASTER_PID=$(cat /tmp/master_queue.pid)
while kill -0 "$MASTER_PID" 2>/dev/null; do sleep 60; done
echo "[followup] $(date +%H:%M:%S) master exited, starting" >> "$LOG"
python bench/serving_overlap_ab.py --xla_lhs \
  > bench/qp_r5/serving_overlap_lhs.json 2>>"$LOG"
echo "[followup] ALL DONE $(date +%H:%M:%S)" >> "$LOG"
