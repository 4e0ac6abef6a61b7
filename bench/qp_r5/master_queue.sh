#!/bin/bash
# Round-5 re-prioritized TPU master queue (replaces tpu_queue.sh +
# tpu_queue2.sh after the 00:58-02:15 axon relay outage ate the first
# four jax quality draws). Single-client relay: exactly ONE TPU process
# at a time. Order = judge value:
#   1. finish the 3-seed bf16_sr quality matrix (VERDICT r5 item 1)
#   2. serving occupancy A/B — cross-batch pipelining (item 2, marquee)
#   3. BN-stats matmul-epilogue on-chip A/B (item 5)
#   4. KITTI-style masked-loss parity case (item 7)
#   5. fp32 jax controls, 3 seeds x 2 models (item 1's control arm)
#   6. flagship convergence-probe spread, seeds 1,2 (item 4)
#   7. bench.py HEAD flagship reading
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=bench/qp_r5/jax_runs.jsonl
LOG=bench/qp_r5/master_queue.log

# (Box restarted 2026-08-20 ~04:13 — no in-flight prior run to wait for;
# the original PID-wait for the pre-restart cls_msg_sr seed-2 run is gone.)
echo "[master] $(date +%H:%M:%S) starting (fresh boot)" >> "$LOG"

run_qp () {
  echo "[master] $(date +%H:%M:%S) qp $*" >> "$LOG"
  python bench/quality_parity.py --platform tpu --jax_only \
    --eval_size 2048 "$@" 2>>"$LOG" | tail -1 >> "$OUT"
}

# --- 1. bf16_sr draws (msg seed-2's pre-restart result was lost with the
# box; it is re-queued here) ---
run_qp --case cls_msg_sr --seed 2 --batch 8
run_qp --case cls_ssg_sr --seed 2 --batch 16
run_qp --case cls_msg_sr --seed 0 --batch 8
run_qp --case cls_ssg_sr --seed 0 --batch 16
run_qp --case cls_msg_sr --seed 1 --batch 8
run_qp --case cls_ssg_sr --seed 1 --batch 16

# --- 2. serving occupancy A/B ---
echo "[master] $(date +%H:%M:%S) serving_overlap_ab" >> "$LOG"
python bench/serving_overlap_ab.py > bench/qp_r5/serving_overlap.json 2>>"$LOG"
echo "[master] $(date +%H:%M:%S) serving_overlap_ab --xla_lhs" >> "$LOG"
python bench/serving_overlap_ab.py --xla_lhs \
  > bench/qp_r5/serving_overlap_lhs.json 2>>"$LOG"

# --- 3. BN epilogue A/B ---
echo "[master] $(date +%H:%M:%S) bn_epilogue_ab" >> "$LOG"
python bench/bn_epilogue_ab.py > bench/qp_r5/bn_epilogue_ab.json 2>>"$LOG"

# --- 4. masked-loss parity (torch half runs on CPU in-process) ---
echo "[master] $(date +%H:%M:%S) masked-loss case" >> "$LOG"
python bench/quality_parity.py --platform tpu --case semseg_masked \
  2>>"$LOG" | tail -1 >> "$OUT"

# --- 5. fp32 control draws ---
for seed in 0 1 2; do
  run_qp --case cls_msg_sr --precision fp32 --seed "$seed" --batch 8
  run_qp --case cls_ssg_sr --precision fp32 --seed "$seed" --batch 16
done

# --- 6. probe spread ---
for spec in "bf16_full_sr 1" "bf16_full_sr 2" "fp32 1" "fp32 2"; do
  set -- $spec
  echo "[master] $(date +%H:%M:%S) probe config=$1 seed=$2" >> "$LOG"
  python bench/convergence_probe.py --config "$1" --seed "$2" \
    2>>"$LOG" | tail -1 >> bench/qp_r5/probe_runs.jsonl
done

# --- 7. flagship bench at HEAD ---
echo "[master] $(date +%H:%M:%S) bench.py" >> "$LOG"
python bench.py > bench/qp_r5/bench_head.json 2>>"$LOG"

echo "[master] ALL DONE $(date +%H:%M:%S)" >> "$LOG"
