"""rsdb_viewer — scripted-screenshot CLI (headless).

Mirrors the reference viewer's scripted screenshot mode
(apps/rsdb_viewer/main.cpp:496-503, :1020-1028):

    python -m rescan_tpu.viewer.cli <rsdb> [--output out.png]
        [--mode rgb|class|instance] [--level N] [--resolution W H]
        [--camera ex ey ez tx ty tz] [--scene_idx I] [--no_placements]
        [--placement_mode optimized|proposals|identity]
"""

from __future__ import annotations

import argparse
import sys

from ..core import database
from . import render


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="rsdb_viewer",
                                 description="Headless rsdb screenshot tool")
    ap.add_argument("rsdb_filename")
    ap.add_argument("--output", "-o", default="screenshot.png")
    ap.add_argument("--mode", choices=("rgb", "class", "instance", "score"),
                    default="instance")
    ap.add_argument("--level", type=int, default=1)
    ap.add_argument("--resolution", nargs=2, type=int, default=(1024, 768))
    ap.add_argument("--camera", nargs=6, type=float, default=None,
                    help="eye xyz + target xyz")
    ap.add_argument("--scene_idx", type=int, default=-1)
    ap.add_argument("--no_placements", action="store_true")
    ap.add_argument("--placement_mode",
                    choices=("optimized", "proposals", "identity"),
                    default="optimized")
    ap.add_argument("--max_proposals", type=int, default=8,
                    help="proposals per object in proposals mode")
    ap.add_argument("--show_bboxes", action="store_true",
                    help="wireframe bbox per drawn placement (debugvis)")
    ap.add_argument("--show_grid", action="store_true",
                    help="floor grid overlay (debugvis)")
    ap.add_argument("--show_axes", action="store_true",
                    help="world axes overlay (debugvis)")
    ap.add_argument("--df_slice_y", type=float, default=None,
                    help="render a scene distance-field slice at height Y")
    ap.add_argument("--surfels", action="store_true",
                    help="splat points at their projected surfel radius")
    ap.add_argument("--edl", type=float, default=0.0, metavar="STRENGTH",
                    help="Eye-Dome Lighting strength (0 = off)")
    args = ap.parse_args(argv)

    db = database.load_database(args.rsdb_filename, load_pointclouds=True)
    if args.placement_mode == "proposals" or args.mode == "score":
        # the reference viewer loads the proposal .bin alongside the rsdb
        # (apps/rsdb_viewer/main.cpp:647-661)
        from ..io import rsdb as rsdbio
        for i, s in enumerate(db.scenes):
            if s.pose_proposal_filename:
                p, sc = rsdbio.load_pose_proposals(s.pose_proposal_filename)
                db.proposed_poses[i] = p
                db.proposed_scores[i] = sc
    cam_eye = cam_tgt = None
    if args.camera:
        cam_eye, cam_tgt = args.camera[:3], args.camera[3:]
    img = render.render_rsdb(
        db, scene_idx=args.scene_idx, mode=args.mode, level=args.level,
        width=args.resolution[0], height=args.resolution[1],
        camera_eye=cam_eye, camera_target=cam_tgt,
        show_placements=not args.no_placements,
        placement_mode=args.placement_mode,
        max_proposals=args.max_proposals,
        show_bboxes=args.show_bboxes, show_grid=args.show_grid,
        show_axes=args.show_axes, df_slice_y=args.df_slice_y,
        surfels=args.surfels, edl_strength=args.edl)
    render.write_png(args.output, img)
    print(f"VIEWER: wrote {args.output} "
          f"({args.resolution[0]}x{args.resolution[1]}, mode={args.mode})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
