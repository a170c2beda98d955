#!/bin/sh
# Build the native components into neuroclear_tpu/native/.
set -e
cd "$(dirname "$0")/.."
mkdir -p neuroclear_tpu/native
g++ -O3 -fPIC -shared -std=c++17 -o neuroclear_tpu/native/libtiffcodec.so \
    native/tiffcodec.cpp
echo "built neuroclear_tpu/native/libtiffcodec.so"
