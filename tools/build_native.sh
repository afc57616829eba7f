#!/usr/bin/env bash
# Build the native host helper library into rescan_tpu/core/librescan_host.so.
set -euo pipefail
cd "$(dirname "$0")/.."
g++ -O3 -march=native -ffp-contract=off -fopenmp -shared -fPIC \
    -o rescan_tpu/core/librescan_host.so native/rescan_host.cpp
echo "BUILT rescan_tpu/core/librescan_host.so"
