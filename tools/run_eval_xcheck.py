#!/usr/bin/env python
"""North-star eval gate (VERDICT r3 item 2): run the UNMODIFIED reference
evaluate_*.py scripts on THIS framework's create_eval_files outputs and
assert their metrics equal rescan_tpu.eval's to 1e-6.

The reference scripts run byte-unmodified via tools/run_ref_eval.py (numpy
alias + plyfile/imageio shims applied to the environment). Their outputs are
parsed from:
  - semantic_label: stdout per-class lines '(tp/denom)' -> exact IoU ratios
    (scripts/evaluate_semantic_label.py:130)
  - instance_transfer: --output_file per-instance 'name iou tp total' rows +
    per-scan 'Mean IOU %8.7f' (scripts/evaluate_instance_transfer.py:131-147)
  - semantic_instance: --output_file CSV with full-precision per-class
    ap/ap50/ap25 (scripts/evaluate_semantic_instance.py:345-355)

Usage:
    python tools/run_eval_xcheck.py [--small] [--root ROOT] [--out OUT.json]

If ROOT has no eval files yet, the 3-scan pipeline is driven first via
tools/run_eval_parity.py (TPU for bench scale; --small runs on CPU).
"""

import argparse
import json
import os
import re
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

TOOLS = os.path.dirname(os.path.abspath(__file__))
REF_SCRIPTS = "/root/reference/scripts"
TOL = 1e-6


def run_ref(script: str, args, cwd=None) -> str:
    cmd = [sys.executable, os.path.join(TOOLS, "run_ref_eval.py"),
           os.path.join(REF_SCRIPTS, script)] + args
    r = subprocess.run(cmd, capture_output=True, text=True, cwd=cwd,
                       timeout=3600)
    if r.returncode != 0:
        raise RuntimeError(f"{script} failed:\n{r.stdout}\n{r.stderr}")
    return r.stdout


def xcheck_semantic_label(ev: str) -> dict:
    from rescan_tpu.eval import semantic_label

    pred_dir = os.path.join(ev, "semantic_label", "predictions")
    gt_dir = os.path.join(ev, "semantic_label", "gt_segmentation")
    stdout = run_ref("evaluate_semantic_label.py",
                     ["--pred_path", pred_dir, "--gt_path", gt_dir])
    # '{name:<14s}: {iou:>5.3f}   ({tp:>6d}/{denom:<6d})'
    ref = {}
    for m in re.finditer(r"^(\w+)\s*: +([\d.]+|nan) +\( *(\d+)/(\d+) *\)",
                         stdout, re.M):
        name, _, tp, denom = m.groups()
        ref[name] = (int(tp) / int(denom), int(tp), int(denom))
    if not ref:
        raise RuntimeError("parsed no per-class rows from reference stdout:\n"
                           + stdout)

    files = sorted(f for f in os.listdir(pred_dir) if f.endswith(".txt"))
    ours = semantic_label.evaluate(
        [os.path.join(pred_dir, f) for f in files],
        [os.path.join(gt_dir, f) for f in files])
    ours_present = {n: v for n, v in ours.items() if v[2] > 0}

    mismatches = []
    if set(ref) != set(ours_present):
        mismatches.append(f"class sets differ: ref={sorted(ref)} "
                          f"ours={sorted(ours_present)}")
    for name in sorted(set(ref) & set(ours_present)):
        r, o = ref[name], ours_present[name]
        if (r[1], r[2]) != (o[1], o[2]) or abs(r[0] - o[0]) > TOL:
            mismatches.append(f"{name}: ref(iou={r[0]:.9f},tp={r[1]},"
                              f"denom={r[2]}) ours(iou={o[0]:.9f},"
                              f"tp={o[1]},denom={o[2]})")
    ref_miou = float(np.mean([v[0] for v in ref.values()]))
    our_miou = float(np.mean([v[0] for v in ours_present.values()]))
    return {"task": "semantic_label", "n_classes_present": len(ref),
            "ref_mIoU": ref_miou, "ours_mIoU": our_miou,
            "max_abs_diff": max((abs(ref[n][0] - ours_present[n][0])
                                 for n in set(ref) & set(ours_present)),
                                default=float("inf")),
            "mismatches": mismatches, "ok": not mismatches}


def xcheck_instance_transfer(ev: str, root: str) -> dict:
    from rescan_tpu.eval import instance_transfer

    pred_dir = os.path.join(ev, "instance_transfer", "predictions")
    gt_dir = os.path.join(ev, "instance_transfer", "gt_segmentation")
    out_file = os.path.join(ev, "ref_instance_transfer.txt")
    # cwd=root: the reference resolves id-equivalence files relative to cwd
    # (evaluate_instance_transfer.py:113); with our scan_NNN.txt naming no
    # eq file resolves, matching our evaluator's behavior.
    run_ref("evaluate_instance_transfer.py",
            ["--pred_path", pred_dir, "--gt_path", gt_dir,
             "--output_file", out_file], cwd=root)
    txt = open(out_file).read()
    scans = {}  # scan file -> (mean_iou, {instance_name: (iou, tp, total)})
    cur = None
    for line in txt.splitlines():
        m = re.match(r"Scan #\s*\d+\s*: (\S+)", line)
        if m:
            cur = m.group(1)
            scans[cur] = [None, {}]
            continue
        m = re.match(r"\s*(\w+_\d+)\s+([\d.]+|nan)\s+(\d+)\s+(\d+)", line)
        if m and cur:
            name, _, tp, total = m.groups()
            scans[cur][1][name] = (int(tp), int(total))
            continue
        m = re.match(r"Mean IOU ([\d.]+|nan)", line)
        if m and cur:
            scans[cur][0] = float(m.group(1))
            cur = None
    m = re.search(r"Average Mean IOU: ([\d.]+|nan)", txt)
    ref_avg = float(m.group(1)) if m else float("nan")

    mismatches = []
    our_means = {}
    for f in sorted(scans):
        pred = np.loadtxt(os.path.join(pred_dir, f), dtype=np.int64)
        gt = np.loadtxt(os.path.join(gt_dir, f), dtype=np.int64)
        conf = instance_transfer.scan_confusion(pred.reshape(-1),
                                                gt.reshape(-1))
        # mirror the reference's per-(instance, semantic) row construction
        ids = np.sort(np.unique(gt))
        ids = ids[ids != 0]
        rows = sorted(zip([int(x % 1000) for x in ids],
                          [int(x // 1000) for x in ids]))
        for inst_id, sem_id in rows:
            iou, tp, total = instance_transfer.instance_iou(conf, inst_id)
            name = (["unlabelled"] + list(
                __import__("rescan_tpu.eval.semantic_label",
                           fromlist=["CLASS_LABELS"]).CLASS_LABELS)
                )[sem_id] + f"_{inst_id}"
            r = scans[f][1].get(name)
            if r is None:
                mismatches.append(f"{f}:{name}: missing in reference output")
            elif (tp, total) != r:
                mismatches.append(f"{f}:{name}: ref tp/total={r} "
                                  f"ours=({tp},{total})")
        our_means[f] = instance_transfer.evaluate_scan(
            os.path.join(pred_dir, f), os.path.join(gt_dir, f))
        if abs(our_means[f] - scans[f][0]) > TOL:
            mismatches.append(f"{f}: scan mean ref={scans[f][0]:.7f} "
                              f"ours={our_means[f]:.9f}")
    our_avg = float(np.mean(list(our_means.values())))
    if abs(our_avg - ref_avg) > TOL:
        mismatches.append(f"average: ref={ref_avg:.7f} ours={our_avg:.9f}")
    return {"task": "instance_transfer", "n_scans": len(scans),
            "ref_avg_mIoU": ref_avg, "ours_avg_mIoU": our_avg,
            "per_scan_ref": {f: s[0] for f, s in scans.items()},
            "mismatches": mismatches, "ok": not mismatches}


def xcheck_semantic_instance(ev: str) -> dict:
    from rescan_tpu.eval import semantic_instance

    pred_dir = os.path.join(ev, "semantic_instance", "predictions")
    gt_dir = os.path.join(ev, "semantic_instance", "gt_segmentation")
    out_file = os.path.join(ev, "ref_semantic_instance.csv")
    run_ref("evaluate_semantic_instance.py",
            ["--pred_path", pred_dir, "--gt_path", gt_dir,
             "--output_file", out_file])
    ref = {}
    with open(out_file) as f:
        next(f)  # header
        for line in f:
            name, _cid, ap, ap50, ap25 = line.strip().split(",")
            ref[name] = (float(ap), float(ap50), float(ap25))

    files = sorted(f for f in os.listdir(pred_dir) if f.endswith(".txt"))
    ours = semantic_instance.evaluate(
        [os.path.join(pred_dir, f) for f in files],
        [os.path.join(gt_dir, f) for f in files])

    mismatches = []
    for name, (rap, rap50, rap25) in ref.items():
        c = ours["classes"][name]
        for key, rv, ov in (("ap", rap, c["ap"]), ("ap50", rap50, c["ap50%"]),
                            ("ap25", rap25, c["ap25%"])):
            both_nan = np.isnan(rv) and np.isnan(ov)
            if not both_nan and (np.isnan(rv) != np.isnan(ov)
                                 or abs(rv - ov) > TOL):
                mismatches.append(f"{name}.{key}: ref={rv} ours={ov}")
    # overall averages: per-class nan-ness is uniform across overlaps, so
    # nanmean over per-class values == the script's flattened nanmean
    with np.errstate(invalid="ignore"):
        ref_all = float(np.nanmean([v[0] for v in ref.values()]))
        ref_all50 = float(np.nanmean([v[1] for v in ref.values()]))
        ref_all25 = float(np.nanmean([v[2] for v in ref.values()]))
    for key, rv, ov in (("all_ap", ref_all, ours["all_ap"]),
                        ("all_ap_50%", ref_all50, ours["all_ap_50%"]),
                        ("all_ap_25%", ref_all25, ours["all_ap_25%"])):
        if abs(rv - ov) > TOL:
            mismatches.append(f"{key}: ref={rv} ours={ov}")
    return {"task": "semantic_instance",
            "ref_all_ap": ref_all, "ours_all_ap": ours["all_ap"],
            "ref_all_ap_50%": ref_all50, "ours_all_ap_50%": ours["all_ap_50%"],
            "ref_all_ap_25%": ref_all25, "ours_all_ap_25%": ours["all_ap_25%"],
            "mismatches": mismatches, "ok": not mismatches}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--root", default=None)
    ap.add_argument("--out", default="EVAL_XCHECK_r04.json")
    args = ap.parse_args()

    root = args.root or ("/tmp/rescan_eval_parity_small" if args.small
                         else "/tmp/rescan_eval_parity")
    ev = os.path.join(root, "eval")
    if not os.path.isdir(os.path.join(ev, "semantic_label", "predictions")):
        print(f"XCHECK: no eval files under {ev}; driving the pipeline "
              f"via run_eval_parity first...")
        cmd = [sys.executable, os.path.join(TOOLS, "run_eval_parity.py"),
               "--root", root, "--out", os.path.join(root, "RESULTS_tmp.json")]
        if args.small:
            cmd.append("--small")
        subprocess.run(cmd, check=True)

    results = [xcheck_semantic_label(ev),
               xcheck_instance_transfer(ev, root),
               xcheck_semantic_instance(ev)]
    out = {"config": "small" if args.small else "bench-scale",
           "root": root, "tolerance": TOL,
           "reference_scripts": "unmodified, via tools/run_ref_eval.py "
                                "(numpy-alias + plyfile/imageio env shims)",
           "tasks": results,
           "all_ok": all(r["ok"] for r in results)}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(json.dumps(out, indent=2))
    return 0 if out["all_ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
