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
#   3. rs_pointcloud.h:698-708 — the face PLY descriptor is a block-scoped
#      local whose pointer msh_ply reads after scope exit
#      (stack-use-after-scope; crashes at -O2 depending on layout).
# segment_transfer is not built: it requires the non-vendored gco-v3.0.
set -euo pipefail

REF=${1:-/root/reference}
OUT=${2:-/tmp/ref_bin}
SRC=/tmp/refsrc

rm -rf "$SRC"
cp -r "$REF" "$SRC"
sed -i 's/char class_name\[64\] = {0};/char class_name[512] = {0};/' "$SRC/lib/rs/rs_database.h"
sed -i 's|if(scene->scn_filename)           free(scene->scn_filename);|/* oracle patch: scn_filename may alias argv */|' "$SRC/lib/rs/rs_database.h"
python3 - "$SRC/lib/rs/rs_pointcloud.h" << 'PYEOF'
import sys
p = sys.argv[1]
src = open(p).read()
old = '''    if( face_specification )
    {
      const char* face_attributes[] = { "vertex_indices" };
      msh_ply_desc_t base_face_desc = { .element_name = (char*)"face",'''
new = '''    static const char* face_attributes[] = { "vertex_indices" };
    msh_ply_desc_t base_face_desc; /* oracle patch: hoisted out of the
      if-block (stack-use-after-scope read inside msh_ply_read) */
    if( face_specification )
    {
      base_face_desc = { .element_name = (char*)"face",'''
assert old in src, "reference source changed; update the patch"
open(p, 'w').write(src.replace(old, new))
PYEOF

mkdir -p "$OUT"

# levels_dump: a small oracle that loads a PLY through the reference ingest
# path (load + resample + 5-level Poisson-disk pyramid) and dumps per-level
# counts/positions/ids for bit-exact parity testing of our ingest.
cat > /tmp/levels_dump.cpp << 'EOF'
#define MSH_STD_IMPLEMENTATION
#define MSH_PLY_IMPLEMENTATION
#define MSH_VEC_MATH_IMPLEMENTATION
#define MSH_GEOMETRY_IMPLEMENTATION
#define MSH_HASH_GRID_IMPLEMENTATION
#define RS_POINTCLOUD_IMPLEMENTATION
#define HASHTABLE_IMPLEMENTATION
#include <cassert>
#include <cmath>
#include <cstring>
#include <cstdint>
#include <cstdarg>
#include <cstddef>
#include <cstdio>
#include <cstdlib>
#include <cfloat>
#include <cctype>
#include "msh/msh_std.h"
#include "msh/msh_vec_math.h"
#include "msh/msh_geometry.h"
#include "msh/msh_ply.h"
#include "msh/msh_hash_grid.h"
#include "mg/hashtable.h"
#include "rs_pointcloud.h"
int main(int argc, char** argv) {
  rs_pointcloud_t* pc = rs_pointcloud_init(1);
  if (rs_pointcloud_from_file(pc, argv[1])) return 1;
  FILE* f = fopen(argv[2], "wb");
  for (int l = 0; l < RSPC_N_LEVELS; ++l) {
    int64_t n = pc->n_pts[l];
    fwrite(&n, 8, 1, f);
    fwrite(pc->positions[l], sizeof(float), 3 * n, f);
    fwrite(pc->class_ids[l], sizeof(int32_t), n, f);
    fwrite(pc->instance_ids[l], sizeof(int32_t), n, f);
  }
  fclose(f);
  return 0;
}
EOF
g++ -O2 -fopenmp -I"$SRC/lib" -I"$SRC/lib/rs" -o "$OUT/levels_dump" /tmp/levels_dump.cpp -lm
echo "BUILT $OUT/levels_dump"

# icp_oracle: runs the reference icp_align on serialized inputs.
# stdin file layout (all little-endian):
#   int32 n1; float pts1[n1*3]; float nor1[n1*3];
#   int32 n2; float pts2[n2*3]; float nor2[n2*3];
#   float T1[16] (column-major); float max_dist; float max_angle;
# output file: float T1[16] (column-major); float err;
cat > /tmp/icp_oracle.cpp << 'EOF'
#define MSH_STD_IMPLEMENTATION
#define MSH_VEC_MATH_IMPLEMENTATION
#define MSH_HASH_GRID_IMPLEMENTATION
#define ICP_IMPLEMENTATION
#include <cassert>
#include <cmath>
#include <cstring>
#include <cstdint>
#include <cstdarg>
#include <cstddef>
#include <cstdio>
#include <cstdlib>
#include <cfloat>
#include <cctype>
#include "msh/msh_std.h"
#include "msh/msh_vec_math.h"
#include "msh/msh_hash_grid.h"
#include "icp.h"
int main(int argc, char** argv) {
  FILE* f = fopen(argv[1], "rb");
  int32_t n1, n2;
  fread(&n1, 4, 1, f);
  msh_vec3_t* p1 = (msh_vec3_t*)malloc(n1 * 12);
  msh_vec3_t* q1 = (msh_vec3_t*)malloc(n1 * 12);
  fread(p1, 12, n1, f); fread(q1, 12, n1, f);
  fread(&n2, 4, 1, f);
  msh_vec3_t* p2 = (msh_vec3_t*)malloc(n2 * 12);
  msh_vec3_t* q2 = (msh_vec3_t*)malloc(n2 * 12);
  fread(p2, 12, n2, f); fread(q2, 12, n2, f);
  msh_mat4_t T;
  float max_dist, max_angle;
  fread(&T, 64, 1, f); fread(&max_dist, 4, 1, f); fread(&max_angle, 4, 1, f);
  fclose(f);
  float err = icp_align(p1, q1, n1, p2, q2, n2, &T, msh_mat4_identity(),
                        max_dist, max_angle, 0);
  FILE* g = fopen(argv[2], "wb");
  fwrite(&T, 64, 1, g); fwrite(&err, 4, 1, g);
  fclose(g);
  return 0;
}
EOF
g++ -O2 -fopenmp -I"$SRC/lib" -I"$SRC/lib/rs" -o "$OUT/icp_oracle" /tmp/icp_oracle.cpp -lm
echo "BUILT $OUT/icp_oracle"

for app in seg2rsdb pose_proposal create_eval_files; do
  srcs="$SRC/apps/$app/main.cpp"
  if [ -f "$SRC/apps/$app/pose_proposal.cpp" ]; then
    srcs="$srcs $SRC/apps/$app/pose_proposal.cpp"
  fi
  g++ -O2 -fopenmp -I"$SRC/lib" -I"$SRC/lib/rs" -o "$OUT/$app" $srcs -lm
  echo "BUILT $OUT/$app"
done
