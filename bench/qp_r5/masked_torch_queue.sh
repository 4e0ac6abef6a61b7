#!/bin/bash
# Waits for the round-5 cls torch queue, then measures the masked case's
# ORACLE-side trajectory noise: 3 torch dropout draws from the same
# seed-5 init (draw 0 = the historical unseeded stream, an integrity
# check against the recorded 0.7975/0.5961). Each finished draw streams
# one JSON line, so a timeout keeps completed draws.
cd /root/repo
export PYTHONPATH=/root/repo
LOG=bench/qp_r5/continuation_queue.log
TQ=$(cat /tmp/torch_queue.pid)
while kill -0 "$TQ" 2>/dev/null; do sleep 60; done
echo "[masked] $(date +%H:%M:%S) cls torch queue drained, masked torch draws" >> "$LOG"
nice -n 10 python bench/quality_parity.py --case semseg_masked \
  --torch_draws 3 --torch_only 2>>"$LOG" \
  >> bench/qp_r5/masked_torch_draws.jsonl
echo "[masked] ALL DONE $(date +%H:%M:%S)" >> "$LOG"
