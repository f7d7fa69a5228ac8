#!/bin/bash -e
set -e  # effective even when invoked as `bash <script>` (shebang flags skipped)
# Lint the codebase (reference dev/linter.sh runs isort/black/flake8).
cd "$(dirname "${BASH_SOURCE[0]}")/.."
python -m compileall -q detectron2_centernet_tpu tools demo || exit 1
command -v flake8 >/dev/null && flake8 --max-line-length 100 detectron2_centernet_tpu || true
command -v black >/dev/null && black --check detectron2_centernet_tpu || true
echo "lint ok"
