#!/bin/bash
# Round-5 TPU-side queue, serialized (one chip):
#  A. multi-seed jax quality draws (VERDICT r5 item 1): cls MSG/SSG,
#     bf16_sr (promoted) + fp32 (control), seeds {0,1,2}, eval_size 2048.
#     Pairs with the torch-oracle CPU queue (torch_queue.sh).
#  B. flagship convergence-probe spread (VERDICT r5 item 4): fp32 and
#     bf16_full_sr at seeds {1,2} (seed 0 = the recorded r3/r4 draws).
#  C. KITTI-style masked-loss parity case (VERDICT r5 item 7) — last:
#     its torch half runs on the (shared) CPU while the chip idles.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=bench/qp_r5/jax_runs.jsonl
LOG=bench/qp_r5/tpu_queue.log

run_qp () {
  echo "[tpu-queue] $(date +%H:%M:%S) qp $*" >> "$LOG"
  python bench/quality_parity.py --platform tpu --jax_only \
    --eval_size 2048 "$@" 2>>"$LOG" | tail -1 >> "$OUT"
}

for seed in 0 1 2; do
  run_qp --case cls_msg_sr --seed "$seed" --batch 8
  run_qp --case cls_ssg_sr --seed "$seed" --batch 16
done
for seed in 0 1 2; do
  run_qp --case cls_msg_sr --precision fp32 --seed "$seed" --batch 8
  run_qp --case cls_ssg_sr --precision fp32 --seed "$seed" --batch 16
done

for spec in "fp32 1" "fp32 2" "bf16_full_sr 1" "bf16_full_sr 2"; do
  set -- $spec
  echo "[tpu-queue] $(date +%H:%M:%S) probe config=$1 seed=$2" >> "$LOG"
  python bench/convergence_probe.py --config "$1" --seed "$2" \
    2>>"$LOG" | tail -1 >> bench/qp_r5/probe_runs.jsonl
done

echo "[tpu-queue] $(date +%H:%M:%S) masked-loss case" >> "$LOG"
python bench/quality_parity.py --platform tpu --case semseg_masked \
  2>>"$LOG" | tail -1 >> "$OUT"

echo "[tpu-queue] ALL DONE $(date +%H:%M:%S)" >> "$LOG"
