#!/bin/sh
# Build the native data-loader library. Idempotent; called automatically by
# wav_loader.py on first use if the .so is missing.
set -e
cd "$(dirname "$0")"
# -ffast-math lets the FIR reductions in ResamplePoly vectorize (audio
# payloads are finite; reassociation error ~1e-6 vs the 1e-3 parity band).
g++ -O3 -march=native -ffast-math -shared -fPIC -o libwavio.so wav_io.cc
echo "built $(pwd)/libwavio.so"
