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
        labels_ops.arrangement_to_labels(db, scene, arr)

        lvl = config.LABEL_LVL
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
    finally:
        os.chdir(cwd)

    with open(os.path.join(cwd, args.out), "w") as f:
        json.dump(out, f, indent=2, default=float)
        f.write("\n")
    print(json.dumps(out, default=float))
    return 0


if __name__ == "__main__":
    sys.exit(main())
