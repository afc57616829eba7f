#!/usr/bin/env python
"""Full-proposal-set parity vs the reference pose_proposal binary
(VERDICT r1 item 4: quantify the 64-NN / 16-NN search-cap deviations at
bench scale, comparing WHOLE proposal sets, not just top-1).

    python tools/run_oracle_parity.py [--resolution N] [--room SIZE]
        [--out PARITY.json]

Runs both implementations on the identical synthetic rescan pair, then per
object greedily matches our proposals to the reference's by pose distance
and reports: proposal-count deltas, matched-pose translation/rotation
residuals, score residuals (where the 64-NN cap of
apps/pose_proposal/pose_proposal.cpp:179 and the 16-candidate ICP cap of
lib/rs/icp.h:330 would show), and unmatched counts.
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

REF_BIN = "/tmp/ref_bin"


def pose_dist(a: np.ndarray, b: np.ndarray):
    dt = float(np.linalg.norm(a[:3, 3] - b[:3, 3]))
    # rotation angle of a^-1 b around +y (poses are y-rotations + xz shift)
    tr = float(np.trace(a[:3, :3].T @ b[:3, :3]))
    ang = float(np.arccos(np.clip((tr - 1.0) / 2.0, -1.0, 1.0)))
    return dt, ang


def match_sets(p_ours, s_ours, p_ref, s_ref, dt_gate=0.08, ang_gate=0.35):
    """Greedy 1:1 matching by (translation + 0.1*angle) cost."""
    used = set()
    matches = []
    for k in range(len(p_ref)):
        best, best_cost = -1, 1e9
        for j in range(len(p_ours)):
            if j in used:
                continue
            dt, ang = pose_dist(p_ref[k], p_ours[j])
            cost = dt + 0.1 * ang
            if dt < dt_gate and ang < ang_gate and cost < best_cost:
                best, best_cost = j, cost
        if best >= 0:
            used.add(best)
            dt, ang = pose_dist(p_ref[k], p_ours[best])
            matches.append((k, best, dt, ang,
                            float(s_ours[best] - s_ref[k])))
    unmatched_ref = len(p_ref) - len(matches)
    unmatched_ours = len(p_ours) - len(matches)
    return matches, unmatched_ref, unmatched_ours


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--resolution", type=int, default=12)
    ap.add_argument("--room", type=float, default=4.0)
    ap.add_argument("--root", default="/tmp/rescan_oracle_parity")
    ap.add_argument("--out", default="PARITY.json")
    ap.add_argument("--scene", choices=["clean", "noisy"], default="clean",
                    help="noisy: rotated room, cylinder + concave shapes, "
                         "sensor noise, normal jitter, per-scan sector "
                         "occlusion (VERDICT r4 item 5), plus per-scan "
                         "global registration error (1 cm / 1 deg) and "
                         "radial density falloff (r5 item 7)")
    args = ap.parse_args()
    if args.scene == "noisy" and args.root == "/tmp/rescan_oracle_parity":
        args.root = "/tmp/rescan_oracle_parity_noisy"

    if not os.path.exists(os.path.join(REF_BIN, "pose_proposal")):
        print("reference oracle not built — run "
              "tools/build_reference_oracle.sh first", file=sys.stderr)
        return 1

    from rescan_tpu.io import rsdb as rsdbio
    from rescan_tpu.pipeline import pose_proposal, seg2rsdb
    from rescan_tpu.utils import synthetic

    root = args.root
    os.makedirs(root, exist_ok=True)
    noise_kw0, noise_kw1 = {}, {}
    if args.scene == "noisy":
        spec = synthetic.noisy_scene_spec(room=args.room)
        # partial views: each scan misses a different wedge of the room
        # (both wedges kept clear of the movable objects)
        # + per-scan registration error (~1 cm, ~1 deg — scan 0 is the
        # registration anchor, so only the rescan is perturbed) and radial
        # density falloff from each scan's scanner position (r5 item 7)
        noise_kw0 = dict(noise_sigma=0.003, normal_jitter_deg=6.0,
                         occlusion=(np.deg2rad(160.0), np.deg2rad(40.0)),
                         density_falloff=((1.2, 1.0), 0.12))
        noise_kw1 = dict(noise_sigma=0.003, normal_jitter_deg=6.0,
                         occlusion=(np.deg2rad(-115.0), np.deg2rad(40.0)),
                         pose_error=(0.01, 1.0),
                         density_falloff=((2.8, 3.0), 0.12))
    else:
        spec = synthetic.SceneSpec(
            room_size=(args.room, args.room), wall_height=2.5, objects=[
                ("chair", (1.0, 1.0), (0.5, 0.9, 0.5), 0.0),
                ("chair", (3.0, 1.2), (0.5, 0.9, 0.5), 0.6),
                ("table", (2.0, 2.0), (1.2, 0.75, 0.8), 0.0),
                ("sofa", (1.0, 3.2), (1.6, 0.8, 0.7), 0.0),
                ("desk", (3.2, 3.0), (1.0, 0.75, 0.6), 1.2)])
    moved = synthetic.moved_scene_spec(spec, (0.5, 0.3), which=0)
    moved = synthetic.moved_scene_spec(moved, (-0.4, 0.5), which=3)
    cls = os.path.join(root, "nyu40_classes.txt")
    scan0 = os.path.join(root, "scan_000.ply")
    scan1 = os.path.join(root, "scan_001.ply")
    if not os.path.exists(scan1):
        synthetic.save_scene_ply(scan0, spec, resolution=args.resolution,
                                 **noise_kw0)
        synthetic.save_scene_ply(scan1, moved, resolution=args.resolution,
                                 seed=1, **noise_kw1)
        synthetic.write_class_file(cls)

    cwd = os.getcwd()
    os.chdir(root)
    try:
        ours_bin = "ours_pp/ours_pp.bin"
        if not os.path.exists(ours_bin):
            seg2rsdb.main([scan0, cls, "./scan_000.rsdb"])
            t0 = time.perf_counter()
            pose_proposal.run("./scan_000.rsdb", scan1, "./ours_pp.rsdb")
            print(f"PARITY: ours ran in {time.perf_counter() - t0:.1f}s")
        ref_bin_file = "ref_pp/ref_pp.bin"
        if not os.path.exists(ref_bin_file):
            # NOTE: output paths MUST contain a directory separator — the
            # reference's create_pose_proposal_filename crashes on bare
            # filenames (filepath_helpers.h:82, strncpy with size -1)
            subprocess.run([f"{REF_BIN}/seg2rsdb", scan0, cls,
                            "./ref_000.rsdb"], check=True, timeout=3600,
                           capture_output=True)
            t0 = time.perf_counter()
            subprocess.run([f"{REF_BIN}/pose_proposal", "./ref_000.rsdb",
                            scan1, "./ref_pp.rsdb", "-v"], check=True,
                           timeout=7200, capture_output=True)
            print(f"PARITY: reference ran in {time.perf_counter() - t0:.1f}s")
        p_ours, s_ours = rsdbio.load_pose_proposals(ours_bin)
        p_ref, s_ref = rsdbio.load_pose_proposals(ref_bin_file)
    finally:
        os.chdir(cwd)

    assert len(p_ours) == len(p_ref), "object count mismatch"
    report = {"resolution": args.resolution, "scene": args.scene,
              "objects": []}
    for i in range(len(p_ours)):
        matches, un_ref, un_ours = match_sets(p_ours[i], s_ours[i],
                                              p_ref[i], s_ref[i])
        dts = [m[2] for m in matches]
        angs = [m[3] for m in matches]
        dss = [m[4] for m in matches]
        top1 = None
        if len(p_ref[i]) and len(p_ours[i]):
            dt, ang = pose_dist(p_ref[i][0], p_ours[i][0])
            top1 = {"dt_m": round(dt, 4), "dang_rad": round(ang, 4),
                    "ds": round(float(s_ours[i][0] - s_ref[i][0]), 4)}
        report["objects"].append({
            "object": i,
            "n_ours": len(p_ours[i]), "n_ref": len(p_ref[i]),
            "matched": len(matches),
            "unmatched_ref": un_ref, "unmatched_ours": un_ours,
            "dt_mean_m": round(float(np.mean(dts)), 4) if dts else None,
            "dt_max_m": round(float(np.max(dts)), 4) if dts else None,
            "dang_max_rad": round(float(np.max(angs)), 4) if angs else None,
            "score_delta_mean": round(float(np.mean(dss)), 4) if dss else None,
            "score_delta_max": round(float(np.max(np.abs(dss))), 4)
            if dss else None,
            "top1": top1,
        })
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
        f.write("\n")
    print(json.dumps(report))
    print("\n| obj | ours | ref | matched | dt max (m) | score d max | top-1 dt |")
    print("|---|---|---|---|---|---|---|")
    for o in report["objects"]:
        t1 = o["top1"]["dt_m"] if o["top1"] else "-"
        print(f"| {o['object']} | {o['n_ours']} | {o['n_ref']} | "
              f"{o['matched']} | {o['dt_max_m']} | {o['score_delta_max']} "
              f"| {t1} |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
