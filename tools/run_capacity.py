#!/usr/bin/env python
"""Capacity/scale stress run, recorded (VERDICT r2 item 6).

Drives the SAME two-room / 21-object / 5-timestep sequence as
tests/test_pipeline_e2e.py::test_capacity_multiroom_sequence through the
full in-process pipeline and records per-timestep stage wall-clock plus
end metrics to CAPACITY_r03.json. Exercises the paths the <=5-object
bench scene never touches: dozens of simultaneous placements through
greedy/SA (FastEnergy growth past its 64-slot initial capacity, the
1024-candidate replace cap), novel-object cloning, label counts crossing
the 8-label bucket boundary, and multi-room bboxes.

Intended for the TPU host (the CPU 8-virtual-device mesh needs hours for
the 21-object grid searches; the pytest copy of this scenario is in the
slow suite for completeness and carries the same construction).

    python tools/run_capacity.py [--out CAPACITY_r03.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def build_specs(control: bool = False):
    """Identical construction to the slow test (seed 7, 2 rooms, 21 objects,
    3 objects moved per timestep). ``control=True`` (VERDICT r3 item 6)
    replaces the random near-twin dimensions with strongly stepped, pairwise
    distinct (footprint, height) per object — geometrically distinguishable
    instances, so any remaining per-scan decline cannot be twin exchange."""
    from rescan_tpu.utils import synthetic

    rng = np.random.default_rng(7)
    objs = [("wall", (1.6, 0.7), (0.08, 0.9, 1.4), 0.0)]  # room divider
    classes = ["chair", "table", "desk", "sofa", "bed"]
    for k in range(20):
        room = k % 2
        x = 0.25 + rng.random() * 1.1 + room * 1.65
        z = 0.25 + rng.random() * 1.1
        s = 0.16 + rng.random() * 0.1
        h = 0.25 + rng.random() * 0.2
        rot = float(rng.random() * 1.5)
        if control:
            # stepped distinct dims: 14..33 cm footprint, alternating
            # aspect; heights stepped 22..41 cm
            s = 0.14 + 0.01 * k
            h = 0.22 + 0.01 * ((7 * k) % 20)
            objs.append((classes[k % len(classes)], (x, z),
                         (s, h, s * (1.25 if k % 2 else 0.8)), rot))
        else:
            objs.append((classes[k % len(classes)], (x, z), (s, h, s), rot))
    spec = synthetic.SceneSpec(room_size=(3.3, 1.6), wall_height=0.9,
                               objects=objs)
    specs = [spec]
    for t in range(4):
        nxt = specs[-1]
        for j in range(3):
            which = 1 + ((t * 3 + j) % 20)
            dx, dz = (rng.random(2) - 0.5) * 0.3
            nxt = synthetic.moved_scene_spec(nxt, (float(dx), float(dz)),
                                             which=which)
        specs.append(nxt)
    return specs


def equivalence_groups(spec, tol: float = 0.07):
    """GT instance-id groups that are geometrically interchangeable: same
    class, every dimension within ``tol`` relative. Returns lists of GT
    instance ids (3 + k, the synthetic generator's convention)."""
    from rescan_tpu.utils.synthetic import _obj_fields

    items = []
    for k, obj in enumerate(spec.objects):
        cls, _, size, _, shape = _obj_fields(obj)
        if cls == "wall":
            continue
        items.append((3 + k, cls, np.asarray(size, np.float64), shape))
    groups = []
    used = set()
    for i, (iid, cls, size, shape) in enumerate(items):
        if iid in used:
            continue
        grp = [iid]
        for jid, cls2, size2, shape2 in items[i + 1:]:
            if jid in used or cls2 != cls or shape2 != shape:
                continue
            if np.all(np.abs(size2 - size) <= tol * np.maximum(size, size2)):
                grp.append(jid)
        for g in grp:
            used.add(g)
        groups.append(grp)
    return [g for g in groups if len(g) > 1]


def write_eq_files(groups, eq_dir: str, scan_names) -> None:
    """Reference-format id-equivalence files (evaluate_instance_transfer.py
    :69-80: '<base> | <eq...>' lines, ids 0-based wrt the +1 matrix
    encoding, i.e. the raw GT instance ids)."""
    os.makedirs(eq_dir, exist_ok=True)
    lines = []
    for grp in groups:
        for base in grp:
            lines.append(f"{base} | " + " ".join(str(g) for g in grp) + "\n")
    for name in scan_names:
        with open(os.path.join(eq_dir, name), "w") as f:
            f.writelines(lines)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/rescan_capacity")
    ap.add_argument("--out", default="CAPACITY_r03.json")
    ap.add_argument("--resolution", type=int, default=5)
    ap.add_argument("--control", action="store_true",
                    help="geometrically distinguishable instances "
                         "(VERDICT r3 item 6 non-degenerate control)")
    args = ap.parse_args()
    if args.control and args.root == "/tmp/rescan_capacity":
        args.root = "/tmp/rescan_capacity_control"

    from rescan_tpu.utils import synthetic
    from rescan_tpu.pipeline import driver
    from rescan_tpu.core import database
    from rescan_tpu.eval import instance_transfer, semantic_label

    root = args.root
    gt = os.path.join(root, "roomX", "gt_segmentation")
    os.makedirs(gt, exist_ok=True)
    specs = build_specs(control=args.control)
    if not os.path.exists(os.path.join(gt, "scan_004.ply")):
        for i, sp in enumerate(specs):
            synthetic.save_scene_ply(os.path.join(gt, f"scan_{i:03d}.ply"),
                                     sp, resolution=args.resolution, seed=i)
    cls_file = os.path.join(root, "nyu40_classes.txt")
    synthetic.write_class_file(cls_file)

    profiles = []
    cwd = os.getcwd()
    os.chdir(root)
    t0 = time.perf_counter()
    try:
        produced = driver.run_sequence(
            "roomX", cls_file, eval_folder=os.path.join(root, "eval"),
            resume=True, profiles=profiles)
    finally:
        os.chdir(cwd)
    wall = time.perf_counter() - t0

    os.chdir(root)  # produced paths and model refs are root-relative
    try:
        db = database.load_database(produced[-1], load_pointclouds=False)
    finally:
        os.chdir(cwd)
    n_dyn = sum(1 for p in db.arrangements[-1]
                if not db.is_object_static(p.object_idx))
    n_objects = len(db.objects)

    ev = os.path.join(root, "eval")
    sl = sorted(os.listdir(os.path.join(ev, "semantic_label", "predictions")))
    sl = [os.path.join(ev, "semantic_label", "predictions", f) for f in sl
          if f.endswith(".txt")]
    ious = semantic_label.evaluate(
        sl, [f.replace("predictions", "gt_segmentation") for f in sl])
    per_class = [v[0] for v in ious.values() if np.isfinite(v[0])]
    miou = float(np.mean(per_class)) if per_class else float("nan")
    it = sorted(os.listdir(
        os.path.join(ev, "instance_transfer", "predictions")))
    it = [os.path.join(ev, "instance_transfer", "predictions", f) for f in it
          if f.endswith(".txt")]
    it_miou = [float(instance_transfer.evaluate_scan(
        f, f.replace("predictions", "gt_segmentation"))) for f in it]

    # id-equivalence-CORRECTED per-scan IT mIoU (VERDICT r3 item 6): GT
    # instances that are geometrically interchangeable (same class, dims
    # within 7%) may legitimately swap identities; the reference's own
    # reorder_confusion protocol applies the correction
    groups = equivalence_groups(specs[0])
    eq_dir = os.path.join(ev, "instance_transfer", "id_equivalences")
    write_eq_files(groups, eq_dir, [os.path.basename(f) for f in it])
    it_miou_eq = [float(instance_transfer.evaluate_scan(
        f, f.replace("predictions", "gt_segmentation"),
        os.path.join(eq_dir, os.path.basename(f)))) for f in it]

    # per-timestep placement traces + database-drift trace (model cloud
    # growth and label purity per object per timestep) from the saved
    # per-timestep databases
    placement_trace = []
    drift_trace = []
    os.chdir(root)
    try:
        for t, dbp in enumerate(produced):
            dbt = database.load_database(dbp, load_pointclouds=True)
            placement_trace.append([
                {"uidx": p.uidx, "object_idx": p.object_idx,
                 "class": dbt.class_name(
                     dbt.objects[p.object_idx].class_idx),
                 "pos": [round(float(x), 4) for x in p.pose[:3, 3]],
                 "score": round(float(p.score), 4)}
                for p in dbt.arrangements[-1]])
            row = []
            for oi, o in enumerate(dbt.objects):
                if dbt.is_object_static(oi) or o.cloud is None:
                    continue
                cls_ids = o.cloud.levels[0]["class_ids"]
                own = int((cls_ids == o.class_idx).sum())
                row.append({"uidx": o.uidx,
                            "class": dbt.class_name(o.class_idx),
                            "n_pts": int(len(cls_ids)),
                            "label_purity": round(own / max(len(cls_ids), 1),
                                                  4)})
            drift_trace.append(row)
    finally:
        os.chdir(cwd)

    out = {
        "scene": "two rooms (wall divider), 21 objects (20 dynamic), "
                 "5 timesteps, 3 objects moved per step, "
                 f"resolution {args.resolution}",
        "n_timesteps": len(produced),
        "wall_s_total": round(wall, 1),
        "n_db_objects_final": n_objects,
        "n_dynamic_placed_final": n_dyn,
        "control": args.control,
        "semantic_label_mIoU": round(miou, 4),
        "instance_transfer_mIoU_per_scan": [round(x, 4) for x in it_miou],
        "instance_transfer_mIoU": round(float(np.mean(it_miou)), 4)
        if it_miou else None,
        "id_equivalence_groups": groups,
        "instance_transfer_mIoU_per_scan_eq_corrected":
            [round(x, 4) for x in it_miou_eq],
        "instance_transfer_mIoU_eq_corrected":
            round(float(np.mean(it_miou_eq)), 4) if it_miou_eq else None,
        "placement_trace": placement_trace,
        "database_drift_trace": drift_trace,
        "stage_profile": [
            {"timestep": pr["timestep"],
             "pose_proposal": {k: round(v, 2)
                               for k, v in pr["pose_proposal"].items()},
             "segment_transfer": {k: round(v, 2)
                                  for k, v in pr["segment_transfer"].items()}}
            for pr in profiles],
    }
    with open(os.path.join(cwd, args.out), "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(json.dumps({k: out[k] for k in
                      ("wall_s_total", "n_db_objects_final",
                       "n_dynamic_placed_final", "semantic_label_mIoU",
                       "instance_transfer_mIoU")}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
