#!/bin/bash
# Build the htslib-linked BAM->CRAM-3.1 converter against the reference
# oracle build (.refbuild/htslib must exist — run tools/build_refbuild.sh
# first). Idempotent; skips when the binary is newer than its source.
set -e
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
SRC="$ROOT/tools/bam2cram31.c"
OUT="$ROOT/.refbuild/bam2cram31"
HTS="$ROOT/.refbuild/htslib"
[ -f "$HTS/libhts.a" ] || { echo "no $HTS/libhts.a (run build_refbuild.sh)"; exit 1; }
if [ -x "$OUT" ] && [ "$OUT" -nt "$SRC" ]; then
  echo "up to date: $OUT"
  exit 0
fi
gcc -O2 -I"$HTS" "$SRC" "$HTS/libhts.a" -llzma -lz -lm -lpthread -o "$OUT"
echo "built: $OUT"
