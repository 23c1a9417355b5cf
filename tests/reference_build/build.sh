#!/bin/bash
# Build the REFERENCE poisson solver (poisson.cpp + utils.cpp compiled
# UNMODIFIED from /root/reference) into a standalone oracle binary, using
# the vendored Eigen/SQLiteCpp trees, system OpenCV, and the minimal
# header shims in shims/ for the libraries absent from this offline image
# (spdlog, fmt, boost.date_time, range-v3, magic_enum — all off the
# numeric path; see PARITY.md).
set -euo pipefail
cd "$(dirname "$0")"

REF=/root/reference
OUT=${1:-/tmp/ref_oracle}
mkdir -p "$OUT"

CXXFLAGS=(
  -std=c++20 -O2 -fPIC
  -I shims
  -I "$REF/lib/approx/include"
  -I "$REF/lib/utils/include"
  -I "$REF/thirdparty/eigen-master"
  -I "$REF/thirdparty/SQLiteCpp-3.3.1/include"
  -I /usr/include/opencv4
)

g++ "${CXXFLAGS[@]}" -c "$REF/lib/approx/source/poisson.cpp" -o "$OUT/poisson.o"
g++ "${CXXFLAGS[@]}" -c "$REF/lib/approx/source/utils.cpp" -o "$OUT/approx_utils.o"
g++ "${CXXFLAGS[@]}" -c stubs.cpp -o "$OUT/stubs.o"
g++ "${CXXFLAGS[@]}" -c oracle_main.cpp -o "$OUT/main.o"
g++ "$OUT/main.o" "$OUT/poisson.o" "$OUT/approx_utils.o" "$OUT/stubs.o" \
  -o "$OUT/ref_poisson_oracle" \
  -lopencv_core -lopencv_imgcodecs -lopencv_imgproc
echo "built $OUT/ref_poisson_oracle"
