#!/bin/sh
# Build the native IO library -> native/libgsplat_io.so
set -e
cd "$(dirname "$0")/.."
g++ -O3 -fPIC -shared -std=c++17 -Wall \
    native/gsplat_io.cpp -o native/libgsplat_io.so
echo "built native/libgsplat_io.so"
