#!/usr/bin/env python
"""64-NN / ICP-16 cap close-out at the OUTCOME level (VERDICT r2 item 7).

The reference caps scoring at 64 NN (apps/pose_proposal/pose_proposal.cpp:179)
and ICP at the first gate-passing of 16 sorted candidates (lib/rs/icp.h:330);
this repo searches uncapped (PARITY_r02 quantified the per-proposal deltas:
top-1 poses <= 6 mm, a few extra low-ranked proposals). The question VERDICT
left open: do those deviations change ARRANGEMENT outcomes?

With SA parity exact (PARITY_r03: all 25000 iterations match), the clean
close-out runs the REFERENCE's own greedy+SA (arrangement_oracle) on BOTH
proposal sets from tools/run_oracle_parity.py — the reference binary's
ref_pp.rsdb (its full capped chain) and this repo's ours_pp.rsdb (uncapped)
— and compares the FINAL arrangements placement by placement. Because
pose_idx spaces differ between the sets, placements are matched by uidx and
compared on object identity and the actual world pose.

    python tools/run_cap_closeout.py [--root DIR] [--out FILE.json]
"""

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

REF_BIN = "/tmp/ref_bin"


def final_arrangement(root: str, db_rel: str):
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from run_arrangement_parity import parse_oracle

    res = subprocess.run([f"{REF_BIN}/arrangement_oracle", db_rel, "full"],
                         capture_output=True, text=True, timeout=3600,
                         cwd=root, check=True)
    return parse_oracle(res.stdout)["arr_sa"]


def pose_delta(a16, b16):
    a = np.array(a16, np.float64).reshape(4, 4, order="F")
    b = np.array(b16, np.float64).reshape(4, 4, order="F")
    dt = float(np.linalg.norm(a[:3, 3] - b[:3, 3]))
    tr = float(np.trace(a[:3, :3].T @ b[:3, :3]))
    ang = float(np.degrees(np.arccos(np.clip((tr - 1.0) / 2.0, -1.0, 1.0))))
    return dt, ang


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/rescan_oracle_parity")
    ap.add_argument("--out", default="CAP_CLOSEOUT.json")
    args = ap.parse_args()

    if not os.path.exists(os.path.join(args.root, "ref_pp.rsdb")):
        print("run tools/run_oracle_parity.py first (produces ref_pp.rsdb "
              "and ours_pp.rsdb)", file=sys.stderr)
        return 1

    arr_ref = final_arrangement(args.root, "ref_pp.rsdb")
    arr_ours = final_arrangement(args.root, "ours_pp.rsdb")

    by_uidx_ref = {p["uidx"]: p for p in arr_ref}
    by_uidx_ours = {p["uidx"]: p for p in arr_ours}
    report = {
        "inputs": {"capped_chain": "ref_pp.rsdb (reference binary: 64-NN "
                                   "scoring cap, ICP-16 candidate cap)",
                   "uncapped_chain": "ours_pp.rsdb (this repo: uncapped "
                                     "gated-NN search)"},
        "optimizer": "reference arrangement_oracle greedy+SA on both "
                     "(SA parity itself is exact per PARITY_r03)",
        "n_placed": {"ref": len(arr_ref), "ours": len(arr_ours)},
        "uidx_set_match": sorted(by_uidx_ref) == sorted(by_uidx_ours),
        "placements": [],
    }
    max_dt, max_ang = 0.0, 0.0
    obj_match = True
    for uidx in sorted(set(by_uidx_ref) | set(by_uidx_ours)):
        a = by_uidx_ref.get(uidx)
        b = by_uidx_ours.get(uidx)
        if a is None or b is None:
            report["placements"].append({"uidx": uidx, "only_in":
                                         "ref" if b is None else "ours"})
            obj_match = False
            continue
        dt, ang = pose_delta(a["pose"], b["pose"])
        max_dt = max(max_dt, dt)
        max_ang = max(max_ang, ang)
        same_obj = a["obj"] == b["obj"]
        obj_match &= same_obj
        report["placements"].append({
            "uidx": uidx, "obj_ref": a["obj"], "obj_ours": b["obj"],
            "object_match": same_obj,
            "pose_dt_m": round(dt, 6), "pose_dang_deg": round(ang, 4)})
    report["object_identity_match"] = obj_match
    report["max_pose_dt_m"] = round(max_dt, 6)
    report["max_pose_dang_deg"] = round(max_ang, 4)
    report["outcome_equivalent"] = (report["uidx_set_match"] and obj_match
                                    and max_dt < 0.02 and max_ang < 2.0)

    # Symmetry-aware geometric equivalence: an angle delta on a
    # rotationally/flip-symmetric object (cylinder: any y-rotation; box:
    # 180-degree flips) places the IDENTICAL surface. Judge each matched
    # pair by the symmetric chamfer distance between the object's cloud
    # under the two poses — pose-space deltas that move no point are not
    # outcome differences.
    from rescan_tpu.core import database as _dbmod
    from rescan_tpu.core import native as _native
    cwd = os.getcwd()
    os.chdir(args.root)
    try:
        db_full = _dbmod.load_database("ours_pp.rsdb", load_pointclouds=True)
    finally:
        os.chdir(cwd)
    geom_ok = True
    for row in report["placements"]:
        if "only_in" in row or not row["object_match"]:
            geom_ok = False
            continue
        if row["pose_dt_m"] < 0.02 and row["pose_dang_deg"] < 2.0:
            row["chamfer_m"] = 0.0 if row["pose_dang_deg"] == 0.0 else None
            continue
        a = by_uidx_ref[row["uidx"]]
        b = by_uidx_ours[row["uidx"]]
        Ta = np.array(a["pose"], np.float64).reshape(4, 4, order="F")
        Tb = np.array(b["pose"], np.float64).reshape(4, 4, order="F")
        pts = db_full.objects[b["obj"]].cloud.pos(2).astype(np.float64)
        pa = (pts @ Ta[:3, :3].T + Ta[:3, 3]).astype(np.float32)
        pb = (pts @ Tb[:3, :3].T + Tb[:3, 3]).astype(np.float32)
        g = _native.HostGrid(pb, 0.05)
        _, d2, cnt = g.radius_search(pa, 0.05, 1)
        miss = (cnt == 0).mean()
        cham = float(np.sqrt(d2[cnt > 0, 0]).mean()) if (cnt > 0).any() \
            else float("inf")
        row["chamfer_m"] = round(cham, 5)
        row["chamfer_unmatched_frac"] = round(float(miss), 4)
        # equivalent when every point lands within the level-2 spacing
        if miss > 0.01 or cham > 0.02:
            geom_ok = False
    report["outcome_equivalent_geom"] = (report["uidx_set_match"]
                                         and obj_match and max_dt < 0.02
                                         and geom_ok)

    # Twin-exchange equivalence: geometrically identical same-class objects
    # make the arrangement energy bimodal, and the annealer's mode choice
    # flips on infinitesimal proposal differences (the identity-swap
    # degeneracy of PARITY_r03 / ROUND3_NOTES item 2; the reference's eval
    # protocol ships id-equivalence files for exactly this). Match ref
    # placements to ours by POSITION (0.05 m gate) and require same-class
    # objects: if a permutation exists, the placed geometry is identical
    # and only the interchangeable identity labels differ.
    from rescan_tpu.core import database
    db = database.load_database(os.path.join(args.root, "ours_pp.rsdb"),
                                load_pointclouds=False)
    cls_of = [o.class_idx for o in db.objects]
    perm, used = {}, set()
    for u, a in by_uidx_ref.items():
        ta = np.array(a["pose"], np.float64).reshape(4, 4, order="F")[:3, 3]
        best, best_d = None, 0.05
        for v, b in by_uidx_ours.items():
            if v in used or cls_of[a["obj"]] != cls_of[b["obj"]]:
                continue
            tb = np.array(b["pose"], np.float64).reshape(4, 4,
                                                         order="F")[:3, 3]
            d = float(np.linalg.norm(ta - tb))
            if d < best_d:
                best, best_d = v, d
        if best is not None:
            perm[u] = best
            used.add(best)
    report["twin_exchange"] = {
        "matched": len(perm), "of": len(by_uidx_ref),
        "permutation": {str(k): v for k, v in perm.items()
                        if k != v},
        "equivalent_up_to_twin_exchange":
            len(perm) == len(by_uidx_ref) == len(by_uidx_ours),
    }

    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
        f.write("\n")
    print(json.dumps({k: report[k] for k in
                      ("n_placed", "uidx_set_match", "object_identity_match",
                       "max_pose_dt_m", "max_pose_dang_deg",
                       "outcome_equivalent")}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
