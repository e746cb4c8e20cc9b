#!/usr/bin/env bash
# Build the native preprocessing library.
set -euo pipefail
cd "$(dirname "$0")"
g++ -O3 -march=native -fopenmp -shared -fPIC preprocess.cpp -o libe4s_preprocess.so
echo "built native/libe4s_preprocess.so"
