#!/usr/bin/env bash
# Build the reference C++ binaries (seg2rsdb, pose_proposal, create_eval_files)
# into /tmp/ref_bin for use as black-box test oracles and baseline measurement.
#
# Two pre-existing bugs in the reference crash it on this libc and are patched
# in a throwaway /tmp copy of the source (the reference itself is read-only;
# nothing is copied into this repository):
#   1. rs_database.h:305 — 64-byte class_name stack buffer stored as a
#      512-byte hashtable value (stack-buffer overread).
#   2. rs_database.h:768 — rsdb_free() frees scene->scn_filename, which
#      seg2rsdb points at argv (free of non-heap pointer, crashes at exit
#      AFTER outputs are written).
# segment_transfer is not built: it requires the non-vendored gco-v3.0.
set -euo pipefail

REF=${1:-/root/reference}
OUT=${2:-/tmp/ref_bin}
SRC=/tmp/refsrc

rm -rf "$SRC"
cp -r "$REF" "$SRC"
sed -i 's/char class_name\[64\] = {0};/char class_name[512] = {0};/' "$SRC/lib/rs/rs_database.h"
sed -i 's|if(scene->scn_filename)           free(scene->scn_filename);|/* oracle patch: scn_filename may alias argv */|' "$SRC/lib/rs/rs_database.h"

mkdir -p "$OUT"
for app in seg2rsdb pose_proposal create_eval_files; do
  srcs="$SRC/apps/$app/main.cpp"
  if [ -f "$SRC/apps/$app/pose_proposal.cpp" ]; then
    srcs="$srcs $SRC/apps/$app/pose_proposal.cpp"
  fi
  g++ -O2 -fopenmp -I"$SRC/lib" -I"$SRC/lib/rs" -o "$OUT/$app" $srcs -lm
  echo "BUILT $OUT/$app"
done
