#!/bin/bash -e
# Wheel builder (reference dev/packaging/build_wheel.sh builds per-CUDA-arch
# torch wheels; the TPU package is pure Python + a small C++ ctypes extension
# compiled on demand, so one universal wheel suffices).
cd "$(dirname "$0")/../.."
python -m pip wheel --no-deps -w dist .
ls -la dist/
