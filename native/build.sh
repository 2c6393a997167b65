#!/bin/sh
# Build libsirdsp.so into native/build/ (cmake+ninja if present, plain g++
# fallback). The Python bindings (data/native.py) look in native/build/ then
# native/.
set -e
cd "$(dirname "$0")"
if command -v cmake >/dev/null 2>&1; then
  mkdir -p build
  if command -v ninja >/dev/null 2>&1; then
    cmake -S . -B build -G Ninja >/dev/null
  else
    cmake -S . -B build >/dev/null
  fi
  cmake --build build --config Release
else
  mkdir -p build
  # built on the machine that runs it -> -march=native is safe (drop the
  # flag if the toolchain rejects it)
  MARCH="-march=native"
  g++ $MARCH -x c++ -c -o /dev/null - </dev/null 2>/dev/null || MARCH=""
  g++ -O3 -fno-math-errno $MARCH -std=c++17 -shared -fPIC sirdsp.cpp -ldl \
    -o build/libsirdsp.so
fi
echo "built: $(ls build/libsirdsp.so)"
