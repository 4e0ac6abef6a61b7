#!/bin/bash
# Round-5 continuation v2: only the runs still missing after the master
# queue's partial progress was reconstructed (masked case + fp32 seed-0
# controls completed before the reorder; fp32 msg seed-1 survives as
# orphan PID recorded below). Waits for that orphan, then:
#   fp32 ssg s1, fp32 msg s2, fp32 ssg s2 -> probes x4 ->
#   bn_epilogue_ab (bitcast fix) -> serving lhs (compiler_options fix) ->
#   bench.py
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=bench/qp_r5/jax_runs.jsonl
LOG=bench/qp_r5/continuation_queue.log
ORPHAN=10651
while kill -0 "$ORPHAN" 2>/dev/null; do sleep 20; done
echo "[cont2] $(date +%H:%M:%S) orphan drained, starting" >> "$LOG"

run_qp () {
  echo "[cont2] $(date +%H:%M:%S) qp $*" >> "$LOG"
  python bench/quality_parity.py --platform tpu --jax_only \
    --eval_size 2048 "$@" 2>>"$LOG" | tail -1 >> "$OUT"
}

run_qp --case cls_ssg_sr --precision fp32 --seed 1 --batch 16
run_qp --case cls_msg_sr --precision fp32 --seed 2 --batch 8
run_qp --case cls_ssg_sr --precision fp32 --seed 2 --batch 16

for spec in "bf16_full_sr 1" "bf16_full_sr 2" "fp32 1" "fp32 2"; do
  set -- $spec
  echo "[cont2] $(date +%H:%M:%S) probe config=$1 seed=$2" >> "$LOG"
  python bench/convergence_probe.py --config "$1" --seed "$2" \
    2>>"$LOG" | tail -1 >> bench/qp_r5/probe_runs.jsonl
done

echo "[cont2] $(date +%H:%M:%S) bn_epilogue_ab" >> "$LOG"
python bench/bn_epilogue_ab.py > bench/qp_r5/bn_epilogue_ab.json 2>>"$LOG"

echo "[cont2] $(date +%H:%M:%S) serving_overlap_ab --xla_lhs" >> "$LOG"
python bench/serving_overlap_ab.py --xla_lhs \
  > bench/qp_r5/serving_overlap_lhs.json 2>>"$LOG"

echo "[cont2] $(date +%H:%M:%S) bench.py" >> "$LOG"
python bench.py > bench/qp_r5/bench_head.json 2>>"$LOG"

echo "[cont2] ALL DONE $(date +%H:%M:%S)" >> "$LOG"
