#!/bin/bash
# Build the reference kmer-db binary from /root/reference into a work
# dir, substituting the absent vendored submodules (mimalloc, zlib-ng,
# isa-l) with system zlib.  Used only to (re)measure the performance
# baseline and to run the differential parity harness
# (tests/test_fuzz_parity.py) — never linked into this project.
set -euo pipefail

SRC=${1:-/root/reference}
DST=${2:-/tmp/refbuild}

if [ -x "$DST/bin/kmer-db" ]; then
    echo "$DST/bin/kmer-db already built"
    exit 0
fi

rm -rf "$DST"
cp -r "$SRC" "$DST"
cd "$DST"

# mimalloc: absent submodule; plain allocator is fine for parity runs
sed -i 's|^#include <mimalloc-new-delete.h>|//#include <mimalloc-new-delete.h>|' src/main.cpp
sed -i 's|^\$(call ADD_MIMALLOC.*|# mimalloc disabled (submodule absent)|' makefile
sed -i 's|^\$(OUT_BIN_DIR)/kmer-db: \$(GZ_TARGET) mimalloc_obj |$(OUT_BIN_DIR)/kmer-db: $(GZ_TARGET) |' makefile
# isa-l: absent; force the zlib path
sed -i 's|^\$(call PROPOSE_ISAL.*|# isa-l disabled|' makefile
# zlib-ng: satisfy the expected build artifacts with system zlib
mkdir -p libs/zlib-ng/build-g++/zlib-ng
cp /usr/lib/x86_64-linux-gnu/libz.a libs/zlib-ng/build-g++/zlib-ng/libz.a
cp /usr/include/zlib.h /usr/include/zconf.h libs/zlib-ng/build-g++/zlib-ng/

make -j"$(nproc)"
echo "built: $DST/bin/kmer-db"
"$DST/bin/kmer-db" -version
