#!/bin/bash
# Waits for continuation v2, then measures the masked-case trajectory
# noise: 3 jax rng draws against the shared torch run (analysis of the
# round-5 single-draw delta 1.7%/1.8%).
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=bench/qp_r5/continuation_queue.log
C2=$(cat /tmp/cont2_queue.pid)
while kill -0 "$C2" 2>/dev/null; do sleep 60; done
echo "[fup2] $(date +%H:%M:%S) cont2 drained, masked-case spread run" >> "$LOG"
python bench/quality_parity.py --platform tpu --case semseg_masked \
  --jax_draws 3 2>>"$LOG" | tail -1 >> bench/qp_r5/jax_runs.jsonl
echo "[fup2] ALL DONE $(date +%H:%M:%S)" >> "$LOG"
