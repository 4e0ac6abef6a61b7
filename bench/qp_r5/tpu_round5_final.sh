#!/bin/bash
# Round-5 final TPU queue (single-client relay: one TPU process at a
# time). Priority order:
#   1. masked-case jax trajectory-noise draws (VERDICT r5 item 7 closure;
#      torch_draws=0 reuses the recorded oracle run — the fup2 attempt
#      died silently because it implicitly queued a ~2h torch rerun)
#   2. extra unpaired jax seeds 3..7 (distributional view tightening)
# Every draw/run streams, so a cut-off keeps completed work.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=bench/qp_r5/continuation_queue.log
OUT=bench/qp_r5/jax_runs.jsonl

echo "[final] $(date +%H:%M:%S) masked jax_draws=3 (torch_draws=0)" >> "$LOG"
nice -n 12 python bench/quality_parity.py --platform tpu \
  --case semseg_masked --jax_draws 3 --torch_draws 0 2>>"$LOG" \
  >> bench/qp_r5/masked_jax_draws.jsonl
echo "[final] $(date +%H:%M:%S) masked draws done" >> "$LOG"

run_qp () {
  echo "[final] $(date +%H:%M:%S) qp $*" >> "$LOG"
  nice -n 12 python bench/quality_parity.py --platform tpu --jax_only \
    --eval_size 2048 "$@" 2>>"$LOG" | tail -1 >> "$OUT"
}

for seed in 3 4 5 6 7; do
  run_qp --case cls_msg_sr --seed "$seed" --batch 8
  run_qp --case cls_msg_sr --precision fp32 --seed "$seed" --batch 8
  run_qp --case cls_ssg_sr --seed "$seed" --batch 16
  run_qp --case cls_ssg_sr --precision fp32 --seed "$seed" --batch 16
done
echo "[final] ALL DONE $(date +%H:%M:%S)" >> "$LOG"
