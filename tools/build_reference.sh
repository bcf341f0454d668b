#!/bin/sh
# Build the reference fastp binary at /tmp/refbuild/fastp for bench/parity.
# This image has libdeflate but no libisal, so the reference's igzip inflate
# calls link against tools/isal_shim.cpp (zlib-backed, functional-only —
# the reference is only ever timed on plain-text input).
set -e
REF=${1:-/root/reference}
OUT=${2:-/tmp/refbuild}
SRC=/tmp/refsrc
if [ ! -x "$OUT/fastp" ]; then
    rm -rf "$SRC"
    cp -r "$REF" "$SRC"
    cp "$(dirname "$0")/isal_shim.cpp" "$SRC/isal_shim.cpp"
    cd "$SRC"
    # object build only; final link replaces -lisal with the shim + zlib
    make -j"$(nproc)" 2>/dev/null || true
    g++ -c isal_shim.cpp -o obj/isal_shim.o -std=c++11 -O2 -I./src
    g++ obj/*.o -o fastp -ldeflate -lz -lpthread
    mkdir -p "$OUT"
    cp fastp "$OUT/fastp"
fi
"$OUT/fastp" --version
