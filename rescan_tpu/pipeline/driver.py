"""Full-sequence pipeline driver.

Mirrors scripts/run_segmentation_pipeline.py: for every sequence in a scene
list, bootstrap the database from the first GT scan, then per rescan run
pose_proposal -> segment_transfer (-> Poisson model fusion when the
external PoissonRecon/SurfaceTrimmer binaries are available). Unlike the
reference (one OS process per stage, all state re-read from disk,
common.py:27-29), stages here run in-process; all inter-stage files are
still written so outputs stay drop-in compatible.

    python -m rescan_tpu.pipeline.driver <scene_list> [--class_file F]
        [--poisson_recon BIN --surface_trimmer BIN]
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import List, Optional

import dataclasses

import numpy as np

from . import create_eval_files, pose_proposal, seg2rsdb, segment_transfer
from .fuse_models import fuse_models


def _snap_arrangements_to_text(db) -> None:
    """Round-trip every arrangement pose/score through the .rsdb text
    precision ('%f', 6 decimals) so the in-memory state is IDENTICAL to
    what a reload of the just-written checkpoint would give — the fused
    in-memory path then produces byte-identical outputs to the
    stage-per-process path."""
    for arr in db.arrangements:
        for j, p in enumerate(arr):
            m = np.asarray(p.pose, np.float32)
            rt = np.array([[float("%f" % float(m[r, c])) for c in range(4)]
                           for r in range(4)], np.float32)
            arr[j] = dataclasses.replace(p, pose=rt,
                                         score=float("%f" % p.score))


def list_subsequences(seq_gt_dir: str) -> List[str]:
    subs = [os.path.splitext(f)[0] for f in os.listdir(seq_gt_dir)
            if f.endswith(".ply")]
    return sorted(subs)


def run_sequence(seq_dir: str, class_file: str,
                 poisson_recon: Optional[str] = None,
                 surface_trimmer: Optional[str] = None,
                 eval_folder: Optional[str] = None,
                 verbose: bool = False,
                 resume: bool = False,
                 in_memory: bool = True,
                 profiles: Optional[list] = None) -> List[str]:
    """Process one scene sequence; returns the list of produced .rsdb
    files (one per timestep).

    ``resume``: skip timesteps whose output .rsdb already exists — the
    .rsdb database IS the pipeline's checkpoint format (every stage's
    state round-trips through it; SURVEY.md §5 checkpoint/resume), so a
    crashed run continues from the last completed timestep.

    ``in_memory``: chain the stages through the in-memory database
    instead of reloading every cloud from disk per stage (the reference
    re-reads everything through its process boundaries; all files are
    still written, so outputs and resumability are identical —
    SURVEY.md §7.3). Old scene clouds are dropped as the sequence
    advances to bound memory.

    ``profiles``: optional list — appends one
    ``{"timestep", "pose_proposal": {...}, "segment_transfer": {...}}``
    per processed rescan with the stages' per-substage wall timings, so a
    sequence run leaves a machine-readable amortized profile (timesteps
    after the first reuse every compiled device program).
    """
    gt_dir = os.path.join(seq_dir, "gt_segmentation")
    subs = list_subsequences(gt_dir)
    if not subs:
        raise FileNotFoundError(f"no .ply scans under {gt_dir}")

    produced = []
    first_ply = os.path.join(gt_dir, subs[0] + ".ply")
    prev_rsdb = os.path.join(seq_dir, subs[0] + ".rsdb")
    db = None
    if not (resume and os.path.exists(prev_rsdb)):
        db = seg2rsdb.run(first_ply, class_file, prev_rsdb, verbose)
        if in_memory:
            _snap_arrangements_to_text(db)
            for s in db.scenes:
                s.cloud = None
            # seg2rsdb extracts object clouds without LoD levels (it only
            # writes level 0); compute them now — identical to what a
            # reload derives from the written level-0 points
            for o in db.objects:
                if o.cloud is not None and o.cloud.levels[1] is None:
                    o.cloud.compute_levels()
        else:
            db = None
    produced.append(prev_rsdb)

    for sub in subs[1:]:
        scan_ply = os.path.join(gt_dir, sub + ".ply")
        pp_rsdb = os.path.join(seq_dir, sub + "_pp.rsdb")
        out_rsdb = os.path.join(seq_dir, sub + ".rsdb")
        if resume and os.path.exists(out_rsdb):
            prev_rsdb = out_rsdb
            produced.append(out_rsdb)
            db = None   # state must come from the checkpoint on disk
            continue
        db = pose_proposal.run(prev_rsdb, scan_ply, pp_rsdb, verbose,
                               db=db)
        db = segment_transfer.run(pp_rsdb, out_rsdb, verbose=verbose,
                                  db=db)
        if profiles is not None:
            profiles.append({
                "timestep": sub,
                "pose_proposal": dict(getattr(
                    db, "last_pose_proposal_timings", {})),
                "segment_transfer": dict(getattr(
                    db, "last_segment_transfer_timings", {})),
            })
        if in_memory:
            # scene clouds are never read again after their timestep
            # (only arrangement poses are); drop them ALL — bounds memory
            # and removes any chance of stale in-memory scene state
            # diverging from the on-disk checkpoint
            for s in db.scenes:
                s.cloud = None
            _snap_arrangements_to_text(db)
        else:
            db = None
        if poisson_recon and surface_trimmer:
            fuse_models(poisson_recon, surface_trimmer,
                        os.path.join(seq_dir, sub))
        if eval_folder:
            pred_ply = os.path.join(seq_dir, "predictions", sub + ".ply")
            create_eval_files.run(pred_ply, eval_folder)
            # GT files at level 1 so their enumeration matches the level-1
            # predictions (mesh GT scans have no vertex/point alignment
            # with the resampled pipeline clouds; see create_eval_files.run)
            create_eval_files.run(scan_ply, eval_folder, level=1)
        prev_rsdb = out_rsdb
        produced.append(out_rsdb)
    return produced


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description="Runs the full rescan segmentation pipeline")
    ap.add_argument("scene_list", help="file listing sequence dirs, one per line")
    # reference-argv compatibility (run_segmentation_pipeline.py takes
    # scene_list binary_folder script_folder); folders are accepted and
    # used only to locate PoissonRecon/SurfaceTrimmer for model fusion
    ap.add_argument("binary_folder", nargs="?", default=None)
    ap.add_argument("script_folder", nargs="?", default=None)
    ap.add_argument("--class_file", default="nyu40_classes.txt")
    ap.add_argument("--poisson_recon", default=None)
    ap.add_argument("--surface_trimmer", default=None)
    ap.add_argument("--eval_folder", default=None)
    ap.add_argument("--resume", action="store_true",
                    help="skip timesteps whose .rsdb checkpoint exists")
    ap.add_argument("--stage_reload", action="store_true",
                    help="reload all state from disk between stages (the "
                    "reference's process-boundary behavior) instead of the "
                    "fused in-memory path; outputs are byte-identical "
                    "either way")
    ap.add_argument("--profile_dir", default=None,
                    help="capture a jax.profiler trace into this directory")
    ap.add_argument("--verbose", "-v", action="store_true")
    args = ap.parse_args(argv)

    poisson, trimmer = args.poisson_recon, args.surface_trimmer
    if args.binary_folder and not poisson:
        cand_p = os.path.join(args.binary_folder, "PoissonRecon")
        cand_t = os.path.join(args.binary_folder, "SurfaceTrimmer")
        if os.path.exists(cand_p) and os.path.exists(cand_t):
            poisson, trimmer = cand_p, cand_t

    profiler_cm = None
    if args.profile_dir:
        import jax
        profiler_cm = jax.profiler.trace(args.profile_dir)
        profiler_cm.__enter__()
    try:
        base = os.path.dirname(args.scene_list)
        with open(args.scene_list) as f:
            sequences = [ln.strip() for ln in f if ln.strip()]
        for seq in sequences:
            run_sequence(os.path.join(base, seq), args.class_file,
                         poisson, trimmer, args.eval_folder, args.verbose,
                         resume=args.resume,
                         in_memory=not args.stage_reload)
    finally:
        if profiler_cm is not None:
            profiler_cm.__exit__(None, None, None)
    return 0


if __name__ == "__main__":
    sys.exit(main())
