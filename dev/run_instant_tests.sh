#!/bin/bash -e
set -e  # effective even when invoked as `bash <script>` (shebang flags skipped)
# ~40-iteration smoke training runs (reference dev/run_instant_tests.sh).
#
# With no datasets on disk, set DETECTRON2_SYNTH_DATA=1 to train each
# schedule on synthetic scenes (data/datasets/synthetic.py); INSTANT_FAST=1
# additionally shrinks iteration counts / input sizes so a full sweep is
# CPU-feasible (first XLA compile dominates per-config runtime).
BIN="python tools/train_net.py"
OUTPUT="instant_test_output"
NUM_GPUS=1  # kept for CLI parity; device count comes from the JAX runtime

CFG_LIST=( "${@:1}" )
if [ ${#CFG_LIST[@]} -eq 0 ]; then
  CFG_LIST=( ./configs/quick_schedules/*instant_test.yaml )
fi

EXTRA=()
if [ -n "$INSTANT_FAST" ]; then
  EXTRA+=( SOLVER.MAX_ITER 4 SOLVER.STEPS "(3,)" SOLVER.WARMUP_ITERS 2
           INPUT.TRAIN_SIZE "(128, 128)" INPUT.TEST_SIZE "(128, 128)"
           TEST.EXPECTED_RESULTS "[]" MODEL.WEIGHTS "" )
fi

for cfg in "${CFG_LIST[@]}"; do
    echo "========================================================================"
    echo "Running $cfg ..."
    echo "========================================================================"
    $BIN --num-gpus $NUM_GPUS --config-file "$cfg" \
      SOLVER.IMS_PER_BATCH $(( NUM_GPUS * 2 )) \
      OUTPUT_DIR "$OUTPUT" "${EXTRA[@]}"
    rm -rf "$OUTPUT"
done
