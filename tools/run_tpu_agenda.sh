#!/bin/bash
# Round-3 hardware measurement agenda — run when the axon tunnel is healthy.
# Each step is individually time-bounded; failures don't stop the rest.
# Usage:  bash tools/run_tpu_agenda.sh 2>&1 | tee /tmp/tpu_agenda.log
set -u
cd "$(dirname "$0")/.."

run() {
  echo "=== [$(date -u +%H:%M:%S)] $* ==="
  timeout 1500 "$@"
  echo "=== rc=$? ==="
}

# -1) driver-style entry() compile check at its bs=8 shape (the whole-layer
#     kernel is new since the last real-chip driver run)
run python __graft_entry__.py

# 0) baseline re-measure (stack kernel refactor shares _layer_rows with the
#    per-layer kernel — confirm no regression vs the 4,237-4,285 band)
run python bench.py

# 1) in-model stack sweep, flagship bs=128 (unmeasured at g=2-4; L=6 was -2%)
run env VIT_TPU_DISABLE_STACK=1 python tools/bench_stack_model.py
for g in 2 3 4; do
  run env VIT_TPU_STACK_LAYERS=$g python tools/bench_stack_model.py
done

# 2) serving regime: fewer grid steps per call -> boundaries matter more
for bs in 8 16; do
  run env BATCH=$bs VIT_TPU_DISABLE_STACK=1 python tools/bench_stack_model.py
  for g in 3 6; do
    run env BATCH=$bs VIT_TPU_STACK_LAYERS=$g python tools/bench_stack_model.py
  done
done

# 3) dimension_semantics A/B on the carry-free forward kernels
run env VIT_TPU_DISABLE_STACK=1 VIT_TPU_DIM_SEMANTICS=parallel python tools/bench_stack_model.py
run env VIT_TPU_DIM_SEMANTICS=parallel python bench.py

# 4) the 10 tpu-marked kernel tests on the real chip
run python -m pytest tests/ -m tpu -p no:warnings --tb=short

# 5) perf breadth: the five BASELINE.json parity configs + MAE pretrain step
run python tools/bench_zoo.py

# 5b) qk-norm kernel A/B (round 3+: in-kernel RMSNorm vs the old XLA fallback)
run python tools/bench_qknorm_model.py
run env VIT_TPU_DISABLE_FUSED=1 python tools/bench_qknorm_model.py

# 6) flagship batch sweep (is 128 still the sweet spot with the whole-layer
#    kernel? round-2 flat band 128-512 was measured on the OLD path)
for bs in 192 256 384; do
  run env BATCH=$bs python tools/bench_stack_model.py
done

echo "=== agenda complete ==="
