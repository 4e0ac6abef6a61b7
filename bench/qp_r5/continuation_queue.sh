#!/bin/bash
# Round-5 continuation queue (replaces master_queue.sh stages 4-7 after
# two mid-queue fixes). Reordered so the TPU-bound stages run first and
# the CPU-bound masked-case torch half (hours on the 1-core host, TPU
# idle) goes LAST:
#   1. fp32 control draws, 3 seeds x 2 models (VERDICT item 1 control arm)
#   2. flagship convergence-probe spread, seeds 1,2 (item 4)
#   3. bn_epilogue_ab rerun (item 5; kernel's optimization_barrier ->
#      bitcast fix)
#   4. serving_overlap_ab --xla_lhs rerun (item 2; flag via
#      compiler_options)
#   5. bench.py HEAD flagship reading
#   6. masked-loss parity case (item 7; torch half on CPU in-process)
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=bench/qp_r5/jax_runs.jsonl
LOG=bench/qp_r5/continuation_queue.log
echo "[cont] $(date +%H:%M:%S) starting" >> "$LOG"

run_qp () {
  echo "[cont] $(date +%H:%M:%S) qp $*" >> "$LOG"
  python bench/quality_parity.py --platform tpu --jax_only \
    --eval_size 2048 "$@" 2>>"$LOG" | tail -1 >> "$OUT"
}

for seed in 0 1 2; do
  run_qp --case cls_msg_sr --precision fp32 --seed "$seed" --batch 8
  run_qp --case cls_ssg_sr --precision fp32 --seed "$seed" --batch 16
done

for spec in "bf16_full_sr 1" "bf16_full_sr 2" "fp32 1" "fp32 2"; do
  set -- $spec
  echo "[cont] $(date +%H:%M:%S) probe config=$1 seed=$2" >> "$LOG"
  python bench/convergence_probe.py --config "$1" --seed "$2" \
    2>>"$LOG" | tail -1 >> bench/qp_r5/probe_runs.jsonl
done

echo "[cont] $(date +%H:%M:%S) bn_epilogue_ab" >> "$LOG"
python bench/bn_epilogue_ab.py > bench/qp_r5/bn_epilogue_ab.json 2>>"$LOG"

echo "[cont] $(date +%H:%M:%S) serving_overlap_ab --xla_lhs" >> "$LOG"
python bench/serving_overlap_ab.py --xla_lhs \
  > bench/qp_r5/serving_overlap_lhs.json 2>>"$LOG"

echo "[cont] $(date +%H:%M:%S) bench.py" >> "$LOG"
python bench.py > bench/qp_r5/bench_head.json 2>>"$LOG"

echo "[cont] $(date +%H:%M:%S) masked-loss case" >> "$LOG"
python bench/quality_parity.py --platform tpu --case semseg_masked \
  2>>"$LOG" | tail -1 >> "$OUT"

echo "[cont] ALL DONE $(date +%H:%M:%S)" >> "$LOG"
