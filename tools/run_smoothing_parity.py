#!/usr/bin/env python
"""Smoothing-engine parity at pipeline scale (VERDICT r2 item 4).

Loads a pipeline-produced .rsdb timestep, reruns the label-transfer +
smoothing stage of segment_transfer with BOTH smoothing engines on the
identical inputs — the production mean-field+ICM and the alpha-beta-swap
graph-cut oracle (native rescan_abswap; the reference's gco swap(2) move
space, rs_pointcloud_filters.cpp:955-968) — and records label disagreement,
per-engine Potts energy, and wall time.

    python tools/run_smoothing_parity.py [--db PATH.rsdb] [--out FILE.json]

Default db: the bench-scale sequence's last timestep
(/tmp/rescan_eval_parity/roomA/scan_002_pp.rsdb by default; run
tools/run_eval_parity.py first).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--db",
                    default="/tmp/rescan_eval_parity/roomA/scan_002_pp.rsdb")
    ap.add_argument("--out", default="SMOOTHING_PARITY.json")
    args = ap.parse_args()

    from rescan_tpu import config
    from rescan_tpu.core import database
    from rescan_tpu.io import rsdb as rsdbio
    from rescan_tpu.ops import labels as labels_ops

    cwd = os.getcwd()
    os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(args.db))))
    try:
        db = database.load_database(args.db, load_pointclouds=True)
        # the arrangement whose labels we smooth: the final one of the
        # PREVIOUS timestep lives in this db; reuse it directly — engine
        # comparison only needs a realistic labeling, not the full stage
        time_idx = len(db.arrangements) - 1
        while len(db.arrangements) < len(db.scenes):
            db.arrangements.append([])
        arr = None
        for i in range(len(db.arrangements) - 1, -1, -1):
            if db.arrangements[i]:
                arr = db.arrangements[i]
                break
        assert arr, "no non-empty arrangement in db"
        scene = db.scenes[-1].cloud
        lvl = config.LABEL_LVL
        # GT segmentation carried from scan ingest (pose_proposal does not
        # label, so a *_pp.rsdb's level ids are still the scan's ground
        # truth) — stashed BEFORE label transfer overwrites them
        gt = {k: v.copy() for k, v in scene.levels[lvl].items()}
        labels_ops.arrangement_to_labels(db, scene, arr)

        base = {k: v.copy() for k, v in scene.levels[lvl].items()}
        n = len(base["class_ids"])

        out = {"db": args.db, "n_points_lvl1": n, "engines": {}}
        results = {}
        for engine in ("native", "abswap"):
            for k, v in base.items():
                scene.levels[lvl][k] = v.copy()
            t0 = time.perf_counter()
            labels_ops.smooth_labels(db, scene, engine=engine)
            dt = time.perf_counter() - t0
            results[engine] = (scene.levels[lvl]["instance_ids"].copy(),
                               scene.levels[lvl]["class_ids"].copy())
            out["engines"][engine] = {"wall_s": round(dt, 2)}

        # energies over the shared graph/unary construction
        for k, v in base.items():
            scene.levels[lvl][k] = v.copy()
        inst = base["instance_ids"]
        cls = base["class_ids"]
        unlabelled_idx = db.class_idx("unlabelled")
        valid = inst[inst < config.MAX_INSTANCES]
        n_labels = (int(valid.max()) if len(valid) else -1) + 5
        n_labels = ((n_labels + 7) // 8) * 8
        labels0 = np.clip(np.where(cls == unlabelled_idx, 0, inst + 1),
                          0, n_labels - 1).astype(np.int32)
        label_to_class = np.full(n_labels, unlabelled_idx, np.int32)
        label_to_inst = np.full(n_labels, config.MAX_INSTANCES, np.int32)
        label_to_class[labels0] = cls
        label_to_inst[labels0] = inst
        is_static = np.array([db.is_class_static(int(c))
                              for c in label_to_class])
        cost = np.where(is_static[labels0], config.SMOOTH_COST_STATIC,
                        config.SMOOTH_COST_DYNAMIC)
        cost = np.where(labels0 == 0, config.SMOOTH_COST_UNLABELLED,
                        cost).astype(np.float32)
        edges, w = labels_ops.build_smoothing_graph(scene)
        pair_w = (np.floor(w * config.SMOOTH_EDGE_COST).astype(np.float32)
                  * config.SMOOTH_EDGE_COST)
        U = cost[:, None] * (1.0 - np.eye(n_labels,
                                          dtype=np.float32)[labels0])

        inv_inst = {}
        for li in range(n_labels):
            inv_inst.setdefault(int(label_to_inst[li]), li)

        def to_label(inst_ids):
            lab = np.array([inv_inst.get(int(i), 0) for i in inst_ids],
                           np.int32)
            return lab

        e0 = labels_ops.potts_energy(U, edges, pair_w, labels0)
        out["initial_energy"] = e0
        for engine, (ii, cc) in results.items():
            lab = to_label(ii)
            out["engines"][engine]["energy"] = \
                labels_ops.potts_energy(U, edges, pair_w, lab)
            out["engines"][engine]["changed_vs_input_pct"] = round(
                100.0 * float(np.mean(ii != inst)), 3)

        a_i, a_c = results["native"]
        b_i, b_c = results["abswap"]
        out["instance_disagreement_pct"] = round(
            100.0 * float(np.mean(a_i != b_i)), 4)
        out["class_disagreement_pct"] = round(
            100.0 * float(np.mean(a_c != b_c)), 4)
        out["energy_delta_meanfield_minus_abswap"] = (
            out["engines"]["native"]["energy"]
            - out["engines"]["abswap"]["energy"])

        # --- where do the engines disagree? (VERDICT r4 item 5: evidence
        # for the "boundary-only" claim). GT boundary = a point with a
        # smoothing-graph neighbor of a different GT instance; bucket every
        # engine-disagreement point by distance to its nearest GT-boundary
        # point, against the all-points base rate ---
        gt_inst = gt.get("instance_ids")
        if gt_inst is not None and len(np.unique(gt_inst)) > 1:
            from rescan_tpu.core import native as native_mod
            bnd = np.zeros(n, bool)
            diff = gt_inst[edges[:, 0]] != gt_inst[edges[:, 1]]
            bnd[edges[diff, 0]] = True
            bnd[edges[diff, 1]] = True
            pts = scene.pos(lvl)
            bpts = pts[bnd]
            r_max = 0.3
            grid = native_mod.HostGrid(bpts, r_max)
            _, d2, cnt = grid.radius_search(pts.astype(np.float32),
                                            r_max, 1)
            cnt = np.asarray(cnt).reshape(-1)
            dist = np.where(cnt > 0, np.sqrt(np.maximum(d2[:, 0], 0.0)),
                            r_max + 1)
            edges_bk = [0.0, 0.02, 0.05, 0.10, r_max, np.inf]
            names = ["<=2cm", "2-5cm", "5-10cm", "10-30cm", ">30cm"]
            dis = a_i != b_i
            bk = {}
            for lo, hi, nm in zip(edges_bk[:-1], edges_bk[1:], names):
                sel = (dist >= lo) & (dist < hi)
                bk[nm] = {
                    "all_points_pct": round(100.0 * float(sel.mean()), 3),
                    "disagreement_pct": round(
                        100.0 * float(sel[dis].mean()) if dis.any() else 0.0,
                        3)}
            out["gt_boundary_points_pct"] = round(
                100.0 * float(bnd.mean()), 3)
            out["disagreement_by_dist_to_gt_boundary"] = bk

            # end metric the smoothing stage controls: level-1 semantic
            # mIoU vs the scan's GT class ids, per engine (the r03 claim
            # "end-metric delta <= 0.019" was mIoU-based)
            gt_cls = gt["class_ids"]
            classes = [c for c in np.unique(gt_cls) if c != unlabelled_idx]

            def miou(pred_cls):
                ious = []
                for c in classes:
                    inter = float(((pred_cls == c) & (gt_cls == c)).sum())
                    union = float(((pred_cls == c) | (gt_cls == c)).sum())
                    if union > 0:
                        ious.append(inter / union)
                return float(np.mean(ious)) if ious else float("nan")

            for engine, (ii, cc) in results.items():
                out["engines"][engine]["miou_lvl1_vs_gt"] = round(
                    miou(cc), 4)
            out["miou_delta_meanfield_minus_abswap"] = round(
                out["engines"]["native"]["miou_lvl1_vs_gt"]
                - out["engines"]["abswap"]["miou_lvl1_vs_gt"], 4)
    finally:
        os.chdir(cwd)

    with open(os.path.join(cwd, args.out), "w") as f:
        json.dump(out, f, indent=2, default=float)
        f.write("\n")
    print(json.dumps(out, default=float))
    return 0


if __name__ == "__main__":
    sys.exit(main())
