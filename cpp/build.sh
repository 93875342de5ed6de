#!/bin/sh
# Build the native Lair interpreter shared library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -std=c++17 -shared -fPIC -pthread -o liblair.so lair_interp.cpp
echo "built cpp/liblair.so"
