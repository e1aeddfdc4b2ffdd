#!/bin/sh
# Build the native host runtime (csc_tpu/native/libcsc_host.so).
set -e
cd "$(dirname "$0")/.."
g++ -O3 -shared -fPIC -std=c++17 -Wall \
    csc_tpu/native/csc_host.cpp -o csc_tpu/native/libcsc_host.so
echo "built csc_tpu/native/libcsc_host.so"
