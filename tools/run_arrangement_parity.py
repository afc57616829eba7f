#!/usr/bin/env python
"""Arrangement-optimization parity vs the reference (VERDICT r2 item 1).

Runs the reference arrangement_oracle (tools/build_reference_oracle.sh) and
this repo's energy stage on the IDENTICAL .rsdb + proposal set (produced by
our own pipeline — both sides consume the same files), then compares:

  * the scene-coverage grid (resolution + salient-cell count, exact),
  * the 4 energy terms on the initial arrangement (abs deltas),
  * the greedy pick sequence (exact (uidx, obj, pose_idx) match),
  * the 25k-iteration SA trajectory, two ways:
      independent — both run free; report the longest matching prefix of
        (restart, action, n, accepted) and where/why they diverge;
      follow — our SA's accept decisions are FORCED to the oracle's so the
        state sequences stay identical and every disagreement is localized;
        each is classified knife-edge (|accept_p - roll| below tol: a f32
        rounding artifact on an exp() threshold) or semantic.

    python tools/run_arrangement_parity.py [--small] [--out FILE.json]

Reference: apps/segment_transfer/arrangement_optimization.cpp (:376-402
terms, :937-1035 greedy, :789-935 SA); main.cpp:313-372 stage flow.
"""

import argparse
import io
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

REF_BIN = "/tmp/ref_bin"


def parse_oracle(stdout: str):
    out = {"terms": {}, "greedy": [], "arr_greedy": [], "arr_sa": [],
           "scn_grid": None, "greedy_init": None, "greedy_pop": False}
    section = "greedy"
    for ln in stdout.splitlines():
        f = ln.split()
        if not f:
            continue
        if f[0] == "SCN_GRID":
            out["scn_grid"] = [int(x) for x in f[1:]]
        elif f[0] == "TERMS":
            out["terms"][f[1]] = [float(x) for x in f[2:]]
        elif f[0] == "GREEDY_INIT":
            out["greedy_init"] = float(f[1])
        elif f[0] == "GREEDY_STEP":
            out["greedy"].append({"k": int(f[1]), "score": float(f[2]),
                                  "uidx": int(f[3]), "obj": int(f[4]),
                                  "pose_idx": int(f[5]),
                                  "pscore": float(f[6])})
        elif f[0] == "GREEDY_POP":
            out["greedy_pop"] = True
        elif f[0] == "GREEDY_DONE":
            section = "sa"
        elif f[0] == "SA_DONE":
            section = "sa_final"
        elif f[0] == "ARR":
            key = "arr_greedy" if section == "sa" else "arr_sa"
            out[key].append({"uidx": int(f[2]), "obj": int(f[3]),
                             "pose_idx": int(f[4]), "score": float(f[5]),
                             "pose": [float(x) for x in f[6:22]]})
    return out


def prepare(db_path: str):
    """Rebuild the pre-arrangement stage state exactly as
    pipeline/segment_transfer.run does (same call order)."""
    from rescan_tpu import config
    from rescan_tpu.core import database
    from rescan_tpu.io import rsdb as rsdbio
    from rescan_tpu.ops import energy, planes
    from rescan_tpu.pipeline import segment_transfer

    db = database.load_database(db_path, load_pointclouds=True)
    while len(db.proposed_poses) < len(db.scenes):
        db.proposed_poses.append(None)
        db.proposed_scores.append(None)
    for i, s in enumerate(db.scenes):
        if (s.pose_proposal_filename and db.proposed_poses[i] is None
                and os.path.exists(s.pose_proposal_filename)):
            p, sc = rsdbio.load_pose_proposals(s.pose_proposal_filename)
            db.proposed_poses[i] = p
            db.proposed_scores[i] = sc
    while len(db.arrangements) < len(db.scenes):
        db.arrangements.append([])
    time_idx = len(db.arrangements) - 1
    scene = db.scenes[time_idx].cloud
    plane_models = planes.detect_planes(scene)
    planes.compute_plane_features(scene, plane_models)
    planes.classify_planes(scene, plane_models)
    segment_transfer.compute_scene_saliency(db, time_idx)
    scene.compute_levels()
    opts = config.ArrangementOpts()
    opts.n_past_steps = min(len(db.arrangements) - 1, opts.n_past_steps)
    ctx = energy.build_context(db, time_idx, db.proposed_poses[time_idx],
                               db.proposed_scores[time_idx])
    return db, ctx, opts, time_idx


def our_terms(ctx, db, time_idx, opts, weights):
    from rescan_tpu.ops import energy
    arr = db.arrangements[time_idx]
    return [energy.coverage_score(ctx, db, arr),
            energy.geometry_score(arr),
            energy.intersection_score(ctx, db, arr),
            energy.hysteresis_score(db, arr, opts.n_past_steps),
            energy.scene_alignment_score(ctx, db, arr, weights,
                                         opts.n_past_steps)]


def parse_trace(path: str):
    rows = []
    with open(path) as f:
        for ln in f:
            p = ln.split()
            if len(p) == 10:
                rows.append(p)
    return rows


def compare_traces(ref_rows, our_rows, knife_tol=2e-3, score_tol=1e-4):
    """Row fields: iter restart action n prev cur temp accept_p roll acc.
    A divergence is a mismatched discrete field (restart/action/n/accepted)
    OR a cur-score delta above score_tol (different action OUTCOME on a
    matching state). accept mismatches where either side's |accept_p-roll|
    is inside knife_tol are knife-edge f32 artifacts of the exp()
    threshold, not semantic differences."""
    n = min(len(ref_rows), len(our_rows))
    first_div = None
    max_cur_delta = 0.0
    divergences = []
    for i in range(n):
        r, o = ref_rows[i], our_rows[i]
        discrete_match = (r[1] == o[1] and r[2] == o[2] and r[3] == o[3])
        acc_match = r[9] == o[9]
        cur_delta = abs(float(r[5]) - float(o[5]))
        max_cur_delta = max(max_cur_delta, cur_delta)
        if not (discrete_match and acc_match and cur_delta <= score_tol):
            if not discrete_match:
                kind = "discrete"
            elif not acc_match:
                kind = ("knife_edge"
                        if abs(float(o[7]) - float(o[8])) < knife_tol
                        or abs(float(r[7]) - float(r[8])) < knife_tol
                        else "semantic")
            else:
                kind = "score"
            divergences.append({"iter": i, "kind": kind,
                                "ref": " ".join(r), "ours": " ".join(o)})
            if first_div is None:
                first_div = i
            if len(divergences) >= 200:
                break
    kinds = {}
    for d in divergences:
        kinds[d["kind"]] = kinds.get(d["kind"], 0) + 1
    return {"n_compared": n, "first_divergence": first_div,
            "n_divergences": len(divergences), "divergence_kinds": kinds,
            "max_cur_score_delta_prefix": max_cur_delta,
            "divergences": divergences[:10]}


def arr_key(a):
    return sorted((p["uidx"], p["obj"], p["pose_idx"]) for p in a)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--root", default=None)
    ap.add_argument("--out", default="PARITY_ARRANGEMENT.json")
    args = ap.parse_args()

    from rescan_tpu.ops import energy

    root = args.root or ("/tmp/rescan_eval_parity_small" if args.small
                         else "/tmp/rescan_eval_parity")
    out_path = os.path.abspath(args.out)
    if not os.path.exists(os.path.join(root, "nyu40_classes.txt")):
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from run_eval_parity import build_sequence
        os.makedirs(root, exist_ok=True)
        build_sequence(root, args.small)
    db_rel = None
    cwd = os.getcwd()
    os.chdir(root)
    try:
        if not os.path.exists("roomA/scan_002_pp.rsdb"):
            from rescan_tpu.pipeline import driver
            driver.run_sequence("roomA",
                                os.path.join(root, "nyu40_classes.txt"),
                                resume=True)
        db_rel = "roomA/scan_002_pp.rsdb"

        # --- reference side -------------------------------------------------
        ref_trace_path = "/tmp/sa_trace_ref.txt"
        env = dict(os.environ, RSAO_TRACE=ref_trace_path)
        res = subprocess.run([f"{REF_BIN}/arrangement_oracle", db_rel, "full"],
                             capture_output=True, text=True, timeout=3600,
                             env=env, check=True)
        ref = parse_oracle(res.stdout)
        ref_rows = parse_trace(ref_trace_path)

        report = {"db": db_rel, "config": "small" if args.small else "bench"}

        # --- our side: scene analysis + terms ------------------------------
        db, ctx, opts, time_idx = prepare(db_rel)
        report["scn_grid"] = {
            "ref": ref["scn_grid"],
            "ours": [int(ctx.res[0]), int(ctx.res[1]), int(ctx.res[2]),
                     int(np.prod(ctx.res)), ctx.n_scn_valid],
        }
        report["terms"] = {}
        for tag, w in (("greedy", opts.energy_weights_greedy),
                       ("sa", opts.energy_weights_sa)):
            ours = our_terms(ctx, db, time_idx, opts, w)
            # oracle order: cov geom isect hyster total
            ref_t = ref["terms"][tag]
            report["terms"][tag] = {
                "ref": ref_t, "ours": [round(x, 9) for x in ours],
                "max_abs_delta": max(abs(a - b)
                                     for a, b in zip(ref_t, ours)),
            }

        # --- greedy ---------------------------------------------------------
        gbuf = io.StringIO()
        energy.greedy_optimize(ctx, db, time_idx, opts, trace_fp=gbuf)
        ours_greedy = parse_oracle(gbuf.getvalue())
        picks_ref = [(g["uidx"], g["obj"], g["pose_idx"])
                     for g in ref["greedy"]]
        picks_ours = [(g["uidx"], g["obj"], g["pose_idx"])
                      for g in ours_greedy["greedy"]]
        report["greedy"] = {
            "picks_ref": picks_ref, "picks_ours": picks_ours,
            "picks_match": picks_ref == picks_ours,
            "pop_match": ref["greedy_pop"] == ours_greedy["greedy_pop"],
            "score_max_delta": max(
                (abs(a["score"] - b["score"]) for a, b in
                 zip(ref["greedy"], ours_greedy["greedy"])), default=None),
        }

        # --- SA independent -------------------------------------------------
        our_trace_path = "/tmp/sa_trace_ours.txt"
        with open(our_trace_path, "w") as tf:
            energy.simulated_annealing(ctx, db, time_idx, opts, trace_fp=tf)
        our_rows = parse_trace(our_trace_path)
        report["sa_independent"] = compare_traces(ref_rows, our_rows)
        report["sa_independent"]["final_arrangement_match"] = (
            arr_key(ref["arr_sa"]) == sorted(
                (p.uidx, p.object_idx, p.pose_idx)
                for p in db.arrangements[time_idx]))

        # --- SA follow mode (fresh state: greedy re-run, then forced SA) ----
        db2, ctx2, opts2, _ = prepare(db_rel)
        energy.greedy_optimize(ctx2, db2, time_idx, opts2)
        with open("/tmp/sa_trace_follow.txt", "w") as tf:
            energy.simulated_annealing(ctx2, db2, time_idx, opts2,
                                       trace_fp=tf, follow=ref_rows)
        follow_rows = parse_trace("/tmp/sa_trace_follow.txt")
        report["sa_follow"] = compare_traces(ref_rows, follow_rows)
        report["sa_follow"]["final_arrangement_match"] = (
            arr_key(ref["arr_sa"]) == sorted(
                (p.uidx, p.object_idx, p.pose_idx)
                for p in db2.arrangements[time_idx]))
    finally:
        os.chdir(cwd)

    with open(out_path, "w") as f:
        json.dump(report, f, indent=2, default=float)
        f.write("\n")
    print(json.dumps({k: v for k, v in report.items()
                      if k not in ("sa_independent", "sa_follow")},
                     default=float))
    for k in ("sa_independent", "sa_follow"):
        r = dict(report[k])
        r.pop("divergences", None)
        print(k, json.dumps(r, default=float))
    return 0


if __name__ == "__main__":
    sys.exit(main())
