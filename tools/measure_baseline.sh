#!/usr/bin/env bash
# Measure the reference pose_proposal wall-clock on the bench scene.
# Requires: tools/build_reference_oracle.sh run first (-> /tmp/ref_bin).
# Writes the scene with bench.py's generator so inputs are identical.
set -euo pipefail
cd "$(dirname "$0")/.."

DIR=/tmp/rescan_baseline
rm -rf "$DIR" && mkdir -p "$DIR"
python3 - << 'EOF'
import sys
sys.path.insert(0, '.')
from rescan_tpu.utils import synthetic
spec = synthetic.SceneSpec(room_size=(4.0, 4.0), wall_height=2.5, objects=[
    ("chair", (1.0, 1.0), (0.5, 0.9, 0.5), 0.0),
    ("chair", (3.0, 1.2), (0.5, 0.9, 0.5), 0.6),
    ("table", (2.0, 2.0), (1.2, 0.75, 0.8), 0.0),
    ("sofa", (1.0, 3.2), (1.6, 0.8, 0.7), 0.0),
    ("desk", (3.2, 3.0), (1.0, 0.75, 0.6), 1.2),
])
synthetic.save_scene_ply('/tmp/rescan_baseline/scan_000.ply', spec, resolution=16)
moved = synthetic.moved_scene_spec(spec, (0.5, 0.3), which=0)
moved = synthetic.moved_scene_spec(moved, (-0.4, 0.5), which=3)
synthetic.save_scene_ply('/tmp/rescan_baseline/scan_001.ply', moved, resolution=16, seed=1)
synthetic.write_class_file('/tmp/rescan_baseline/nyu40_classes.txt')
EOF

cd "$DIR"
/tmp/ref_bin/seg2rsdb ./scan_000.ply ./nyu40_classes.txt ./scan_000.rsdb
# NOTE: output paths need a directory separator — the reference's
# create_pose_proposal_filename crashes on bare filenames
# (filepath_helpers.h:82, strncpy with size -1); -v is mandatory
# (main.cpp:133-141 gates success on verbose).
start=$(date +%s)
/tmp/ref_bin/pose_proposal ./scan_000.rsdb ./scan_001.ply ./scan_001_pp.rsdb -v \
  | grep -E "Computed poses|Level . processing"
echo "WALL_SECONDS $(( $(date +%s) - start ))"
