#!/bin/sh
# Build the native data-loader library. Idempotent; called automatically by
# wav_loader.py on first use if the .so is missing.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -o libwavio.so wav_io.cc
echo "built $(pwd)/libwavio.so"
