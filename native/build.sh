#!/bin/sh
# Build the host-side native kernels into the package (idempotent).
set -e
DIR="$(cd "$(dirname "$0")" && pwd)"
OUT="$DIR/../vorbis_tpu/_vorbisnative.so"
if [ "$DIR/vorbisnative.c" -nt "$OUT" ] || [ ! -f "$OUT" ]; then
  cc -O3 -march=native -ffp-contract=off -fPIC -shared -o "$OUT" "$DIR/vorbisnative.c" -lm
  echo "built $OUT"
fi
