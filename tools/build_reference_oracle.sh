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

# ---------------------------------------------------------------------------
# arrangement_oracle: drives the reference arrangement-optimization stage
# (greedy + simulated annealing, apps/segment_transfer/arrangement_optimization.cpp)
# on a given .rsdb as a black-box parity oracle. gco (GCoptimization) is NOT
# vendored, but it is only used by rspf_smooth_labels — which this oracle
# never calls — so the /tmp copy stubs that one function out.
#
# Instrumentation (patched into the /tmp copy, guarded by env RSAO_TRACE):
# every SA iteration appends "iter restart action n prev cur temp accept_p
# roll accepted" to $RSAO_TRACE for step-level trajectory comparison.

# patch 1: drop the gco include + stub rspf_smooth_labels
python3 - "$SRC/lib/rs/rs_pointcloud_filters.cpp" << 'PYEOF'
import sys
p = sys.argv[1]
src = open(p).read()
src = src.replace('#include "GCoptimization.h" \n',
                  '#include <cstring>\n#include <cassert>\n')
start = src.index('rspf_smooth_labels( rsdb_t* rsdb, rs_pointcloud_t* in_pc )')
open_brace = src.index('{', start)
end_anchor = '''  free(labels);
  msh_array_free(edges);
  free(data_cost);
  free(smooth_cost);
}'''
end = src.index(end_anchor, start) + len(end_anchor)
stub = ('{ (void)rsdb; (void)in_pc;\n'
        '  printf("oracle stub: rspf_smooth_labels skipped (gco not vendored)\\n");\n'
        '}')
src = src[:open_brace] + stub + src[end:]
open(p, 'w').write(src)
PYEOF

# patch 2: SA per-iteration trace
python3 - "$SRC/apps/segment_transfer/arrangement_optimization.cpp" << 'PYEOF'
import sys
p = sys.argv[1]
src = open(p).read()

src = src.replace('#define INTERSECTION_IMPLEMENTATION\n', '')
src = src.replace('#define MSH_GEOMETRY_IMPLEMENTATION\n', '')
anchor = '#include "arrangement_optimization.h"'
assert anchor in src
src = src.replace(anchor, anchor + '''

static FILE* rsao__trace_fp = NULL;
static int rsao__trace_restart = 0;''', 1)

anchor = 'msh_rand_init(&rand_gen, 12346ULL );'
assert anchor in src
src = src.replace(anchor, anchor + '''
  { const char* tp = getenv("RSAO_TRACE");
    if( tp && !rsao__trace_fp ) rsao__trace_fp = fopen( tp, "w" ); }''', 1)

anchor = 'msh_cprintf(iter % 100 == 0, "SIMULATED_ANNEALING: Iteration %d\\n", iter );'
assert anchor in src
src = src.replace(anchor, anchor + '''
    rsao__trace_restart = 0;''', 1)

anchor = 'msh_cprintf(iter%100 == 0,  "SIMULATED_ANNEALING: Random restart!\\n" );'
assert anchor in src
src = src.replace(anchor, anchor + '''
      rsao__trace_restart = 1;''', 1)

anchor = 'float roll = msh_rand_nextf(&rand_gen);'
assert anchor in src
src = src.replace(anchor, anchor + '''
    if( rsao__trace_fp )
      fprintf( rsao__trace_fp, "%d %d %d %d %.9g %.9g %.9g %.9g %.9g %d\\n",
               iter, rsao__trace_restart, (int)action,
               (int)msh_array_len(cur_arrangement), prev_score, cur_score,
               temp, acceptance_prob, roll, (int)(acceptance_prob >= roll) );''', 1)

anchor = 'printf( "SIMULATED_ANNEALING: Done in %fs. | Score: %f -> %f\\n", msh_time_diff_sec( t2, t1), init_score, max_score );'
assert anchor in src
src = src.replace(anchor, anchor + '''
  if( rsao__trace_fp ) { fclose( rsao__trace_fp ); rsao__trace_fp = NULL; }''', 1)
open(p, 'w').write(src)
PYEOF

cat > /tmp/arrangement_oracle.cpp << 'EOF'
// arrangement_oracle <db.rsdb> <mode> — mode: terms | greedy | sa | full
// Loads an .rsdb (+ the pose-proposal .bin files its scenes reference,
// resolved relative to cwd), rebuilds the scene-analysis state exactly as
// apps/segment_transfer/main.cpp:313-342 does, then runs the requested
// stage(s) of the reference arrangement optimization, dumping
// machine-readable lines:
//   TERMS <tag> <scncov> <geom> <isect> <hyster> <total>
//   GREEDY_INIT <score> / GREEDY_STEP <k> <score> <uidx> <obj> <pose_idx> <pscore>
//   ARR <i> <uidx> <obj> <pose_idx> <score> <16 pose floats col-major>
// SA tracing goes to $RSAO_TRACE (see patch above).
#define MSH_STD_IMPLEMENTATION
#define MSH_VEC_MATH_IMPLEMENTATION
#define MSH_GEOMETRY_IMPLEMENTATION
#define MSH_PLY_IMPLEMENTATION
#define MSH_HASH_GRID_IMPLEMENTATION
#define RS_DATABASE_IMPLEMENTATION
#define RS_POINTCLOUD_IMPLEMENTATION
#define RS_DISTANCE_FUNCTION_IMPLEMENTATION
#define FILEPATH_HELPERS_IMPLEMENTATION
#define HASHTABLE_IMPLEMENTATION
#define INTERSECTION_IMPLEMENTATION
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
#include "filepath_helpers.h"
#include "rs_pointcloud.h"
#include "rs_distance_function.h"
#include "rs_database.h"
#include "intersect.h"
#include "rs_pointcloud_filters.h"
// The stb-style implementation sections above sit OUTSIDE the include
// guards; arrangement_optimization.cpp re-includes these headers, so the
// macros must be gone by then or every impl is emitted twice (its own
// INTERSECTION/MSH_GEOMETRY defines are stripped by the build patch).
#undef MSH_STD_IMPLEMENTATION
#undef MSH_VEC_MATH_IMPLEMENTATION
#undef MSH_GEOMETRY_IMPLEMENTATION
#undef MSH_PLY_IMPLEMENTATION
#undef MSH_HASH_GRID_IMPLEMENTATION
#undef RS_DATABASE_IMPLEMENTATION
#undef RS_POINTCLOUD_IMPLEMENTATION
#undef RS_DISTANCE_FUNCTION_IMPLEMENTATION
#undef FILEPATH_HELPERS_IMPLEMENTATION
#undef HASHTABLE_IMPLEMENTATION
#undef INTERSECTION_IMPLEMENTATION
#include "arrangement_optimization.cpp"   // same TU: internal terms callable
#include "rs_pointcloud_filters.cpp"       // same TU: msh_array templates need
                                           // the impl visible at instantiation

static void
oracle_load_proposals( const char* filename,
                       msh_array(msh_array(msh_mat4_t))* poses,
                       msh_array(msh_array(float))* scores )
{
  FILE* fp = fopen( filename, "rb" );
  if( !fp ) { fprintf( stderr, "cannot open proposals %s\n", filename ); exit( 2 ); }
  int32_t n_arrays = 0;
  if( fread( &n_arrays, 4, 1, fp ) != 1 ) exit( 2 );
  int32_t* counts = (int32_t*)malloc( n_arrays * 4 );
  for( int32_t i = 0; i < n_arrays; ++i )
    if( fread( &counts[i], 4, 1, fp ) != 1 ) exit( 2 );
  *poses = NULL; *scores = NULL;
  for( int32_t i = 0; i < n_arrays; ++i )
  {
    msh_array(msh_mat4_t) cp = NULL;
    msh_array(float) cs = NULL;
    for( int32_t j = 0; j < counts[i]; ++j )
    {
      float rec[17];
      if( fread( rec, 4, 17, fp ) != 17 ) exit( 2 );
      msh_mat4_t m; memcpy( &m, rec, 64 );
      msh_array_push( cp, m );
      msh_array_push( cs, rec[16] );
    }
    msh_array_push( *poses, cp );
    msh_array_push( *scores, cs );
  }
  free( counts );
  fclose( fp );
}

static void
dump_arrangement( rsdb_t* rsdb, int32_t idx )
{
  for( size_t i = 0; i < msh_array_len( rsdb->arrangements[idx] ); ++i )
  {
    rs_obj_plcmnt_t* p = &rsdb->arrangements[idx][i];
    printf( "ARR %zu %d %d %d %.9g", i, p->uidx, p->object_idx, p->pose_idx,
            p->score );
    const float* m = &p->pose.col[0].x;
    for( int k = 0; k < 16; ++k ) printf( " %.9g", m[k] );
    printf( "\n" );
  }
}

static void
dump_terms( rsdb_t* rsdb, int32_t idx, rsao_opts_t* opts, double* w,
            const char* tag )
{
  msh_array(rs_obj_plcmnt_t) arr = rsdb->arrangements[idx];
  float c = rsao__compute_scene_coverage_score( rsdb, arr, opts, 0 );
  float g = rsao__compute_geometry_score( rsdb, arr, opts, 0 );
  float s = rsao__compute_intersection_score( rsdb, arr, opts, 0 );
  float h = rsao__compute_hysteresis_score( rsdb, arr, opts, false );
  float t = rsao_compute_scene_alignment_score( rsdb, arr, opts, w, 0 );
  printf( "TERMS %s %.9g %.9g %.9g %.9g %.9g\n", tag, c, g, s, h, t );
}

int
main( int argc, char** argv )
{
  if( argc < 3 ) { fprintf( stderr, "usage: %s db.rsdb terms|greedy|sa|full\n", argv[0] ); return 1; }
  const char* mode = argv[2];
  rsao_opts_t ao = {};
  rsao_init_opts( &ao );

  rsdb_t* rsdb = rsdb_init();
  if( rsdb_load( rsdb, argv[1], 1 ) ) { fprintf( stderr, "rsdb_load failed\n" ); return 2; }

  int32_t n_scenes = (int32_t)msh_array_len( rsdb->scenes );
  for( int32_t i = 0; i < n_scenes; ++i )
    if( rsdb->scenes[i].pose_proposal_filename )
      oracle_load_proposals( rsdb->scenes[i].pose_proposal_filename,
                             &rsdb->proposed_poses[i],
                             &rsdb->proposed_poses_scores[i] );
  while( msh_array_len( rsdb->arrangements ) < msh_array_len( rsdb->scenes ) )
  {
    msh_array(rs_obj_plcmnt_t) a = NULL;
    msh_array_push( rsdb->arrangements, a );
  }
  int32_t TIME_IDX = (int32_t)msh_array_len( rsdb->arrangements ) - 1;

  // scene-analysis state (main.cpp:313-342)
  isect_grid3d_t scn_grd = {}, arrangement_grd = {}, isect_grd = {}, saliency_grd = {};
  msh_array(rspf_plane_model_t) planes = NULL;
  if( !rsdb->scenes[TIME_IDX].pose_proposal_filename )
  { fprintf( stderr, "last scene has no proposals\n" ); return 3; }
  float voxel_size = 0.05f;
  isect_grid3d_init( &scn_grd, &rsdb->scenes[TIME_IDX].shape->bbox, voxel_size );
  isect_grid3d_init( &arrangement_grd, &rsdb->scenes[TIME_IDX].shape->bbox, voxel_size );
  isect_grid3d_init( &isect_grd, &rsdb->scenes[TIME_IDX].shape->bbox, voxel_size );
  isect_grid3d_init( &saliency_grd, &rsdb->scenes[TIME_IDX].shape->bbox, 0.15f );
  ao.scn_grd = &scn_grd;
  ao.arrangement_grd = &arrangement_grd;
  ao.isect_grd = &isect_grd;
  ao.saliency_grd = &saliency_grd;
  rspf_detect_planes( rsdb->scenes[TIME_IDX].shape, &planes );
  rspf_compute_plane_features( rsdb->scenes[TIME_IDX].shape, &planes );
  rspf_classify_planes( rsdb->scenes[TIME_IDX].shape, &planes );
  rsao_compute_scene_saliency( rsdb, TIME_IDX, &ao );
  rs_pointcloud_compute_levels( rsdb->scenes[TIME_IDX].shape );
  rsao_rasterize_scene_to_grid( &rsdb->scenes[TIME_IDX], &scn_grd, 0.5f );
  ao.n_past_steps = msh_min( (int32_t)msh_array_len( rsdb->arrangements ) - 1,
                             ao.n_past_steps );
  {
    int32_t n_valid = 0;
    for( int32_t i = 0; i < scn_grd.n_cells; ++i ) n_valid += scn_grd.data[i] > 0;
    printf( "SCN_GRID %d %d %d %d %d\n", scn_grd.x_res, scn_grd.y_res,
            scn_grd.z_res, scn_grd.n_cells, n_valid );
  }

  dump_terms( rsdb, TIME_IDX, &ao, ao.energy_function_weights_greedy, "greedy" );
  dump_terms( rsdb, TIME_IDX, &ao, ao.energy_function_weights_sa, "sa" );

  if( !strcmp( mode, "greedy" ) || !strcmp( mode, "full" ) )
  {
    double score = rsao_compute_scene_alignment_score(
        rsdb, rsdb->arrangements[TIME_IDX], &ao,
        ao.energy_function_weights_greedy, 0 );
    printf( "GREEDY_INIT %.9g\n", score );
    double prev_score = 0.0;
    int32_t k = 0;
    for( ;; )
    {
      prev_score = score;
      score = rsao_greedy_step( rsdb, TIME_IDX, &ao );
      size_t n = msh_array_len( rsdb->arrangements[TIME_IDX] );
      rs_obj_plcmnt_t* last = n ? &rsdb->arrangements[TIME_IDX][n-1] : NULL;
      printf( "GREEDY_STEP %d %.9g %d %d %d %.9g\n", k++, score,
              last ? last->uidx : -1, last ? last->object_idx : -1,
              last ? last->pose_idx : -1, last ? last->score : 0.0f );
      if( prev_score - score > 0.000001 )
      { msh_array_pop( rsdb->arrangements[TIME_IDX] ); printf( "GREEDY_POP\n" ); break; }
      if( fabs( prev_score - score ) < 0.000001 ) break;
    }
    printf( "GREEDY_DONE %zu\n", msh_array_len( rsdb->arrangements[TIME_IDX] ) );
    dump_arrangement( rsdb, TIME_IDX );
  }

  if( !strcmp( mode, "sa" ) || !strcmp( mode, "full" ) )
  {
    rsao_simulated_annealing( rsdb, TIME_IDX, &ao );
    printf( "SA_DONE %zu\n", msh_array_len( rsdb->arrangements[TIME_IDX] ) );
    dump_arrangement( rsdb, TIME_IDX );
    dump_terms( rsdb, TIME_IDX, &ao, ao.energy_function_weights_sa, "sa_final" );
  }
  return 0;
}
EOF
g++ -O2 -fopenmp -I"$SRC/lib" -I"$SRC/lib/rs" -I"$SRC/apps/segment_transfer" \
    -o "$OUT/arrangement_oracle" /tmp/arrangement_oracle.cpp -lm
echo "BUILT $OUT/arrangement_oracle"
