#!/bin/bash -e
set -e  # effective even when invoked as `bash <script>` (shebang flags skipped)
# Synthetic training-accuracy regressions (the reference's
# dev/run_inference_tests.sh *training_acc_test analog, runnable with no
# datasets on disk): train a tiny model per family on the learnable
# color-rectangle scenes and enforce TEST.EXPECTED_RESULTS — a real
# end-to-end convergence check for the loss/matching/eval stack.
BIN="python tools/train_net.py"
OUTPUT="training_acc_output"
export DETECTRON2_SYNTH_DATA=1

CFG_LIST=( "${@:1}" )
if [ ${#CFG_LIST[@]} -eq 0 ]; then
  CFG_LIST=(
    ./configs/quick_schedules/ctdet_synth_training_acc_test.yaml
    ./configs/quick_schedules/ctdet_dla_synth_training_acc_test.yaml
    ./configs/quick_schedules/retinanet_synth_training_acc_test.yaml
    ./configs/quick_schedules/mask_rcnn_synth_training_acc_test.yaml
    ./configs/quick_schedules/keypoint_rcnn_synth_training_acc_test.yaml
    ./configs/quick_schedules/semantic_synth_training_acc_test.yaml
  )
fi

for cfg in "${CFG_LIST[@]}"; do
    echo "========================================================================"
    echo "Running $cfg ..."
    echo "========================================================================"
    $BIN --config-file "$cfg" OUTPUT_DIR "$OUTPUT"
    rm -rf "$OUTPUT"
done
