#!/bin/sh
# Builds the reference-math-core golden harness (tools/ref_harness.cpp) against the
# UNMODIFIED reference sources in /root/reference and system OpenCV. Output binary path
# is $1 (default: build/ref_harness). Exits nonzero if the toolchain/headers are absent.
set -e
REF=${REF:-/root/reference}
OUT=${1:-build/ref_harness}
mkdir -p "$(dirname "$OUT")"
exec g++ -std=c++20 -O2 -w -o "$OUT" \
    "$(dirname "$0")/ref_harness.cpp" \
    "$REF/src/processing/magnification/SpatialFilter.cpp" \
    "$REF/src/processing/magnification/TemporalFilter.cpp" \
    "$REF/src/processing/magnification/RieszPyramid.cpp" \
    -I"$REF/src" -I/usr/include/opencv4 \
    -lopencv_core -lopencv_imgproc
