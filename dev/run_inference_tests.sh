#!/bin/bash -e
set -e  # effective even when invoked as `bash <script>` (shebang flags skipped)
# Inference accuracy regression runs (reference dev/run_inference_tests.sh):
# evaluates released weights and enforces TEST.EXPECTED_RESULTS.
BIN="python tools/train_net.py"
OUTPUT="inference_test_output"

CFG_LIST=( "${@:1}" )
if [ ${#CFG_LIST[@]} -eq 0 ]; then
  CFG_LIST=( ./configs/quick_schedules/*inference_acc_test.yaml )
fi

for cfg in "${CFG_LIST[@]}"; do
    echo "========================================================================"
    echo "Running $cfg ..."
    echo "========================================================================"
    $BIN --eval-only --config-file "$cfg" OUTPUT_DIR "$OUTPUT"
    rm -rf "$OUTPUT"
done
