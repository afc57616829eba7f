"""North-star eval gate in the fast suite: the UNMODIFIED reference
evaluate_*.py scripts (run via tools/run_ref_eval.py's environment shims)
must agree with rescan_tpu.eval to 1e-6 on the same eval files.

Tiny synthetic eval files are built directly in the ScanNet .txt format
create_eval_files emits, with deliberate prediction errors so IoU < 1 and
the AP precision-recall curves are non-trivial.
"""

import importlib.util
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference/scripts"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference scripts not present")


def _load_xcheck():
    spec = importlib.util.spec_from_file_location(
        "run_eval_xcheck", os.path.join(REPO, "tools", "run_eval_xcheck.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _write_ids(path, ids):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savetxt(path, np.asarray(ids, np.int64), fmt="%d")


@pytest.fixture(scope="module")
def eval_root(tmp_path_factory):
    """Two 1200-vertex scans: classes wall(1)/chair(5)/table(7), globally
    unique instance ids, ~8% prediction label noise + one merged instance."""
    root = tmp_path_factory.mktemp("xcheck_root")
    ev = root / "eval"
    rng = np.random.default_rng(7)
    for s, scan in enumerate(["scan_000", "scan_001"]):
        n = 1200
        gt = np.zeros(n, np.int64)
        # encoded 1000*class + instance (create_eval_files encoding)
        gt[:400] = 1000 * 1 + 0          # wall, static (instance 0)
        gt[400:700] = 1000 * 5 + 1       # chair_1
        gt[700:900] = 1000 * 5 + 2       # chair_2
        gt[900:1200] = 1000 * 7 + 3      # table_3
        pred = gt.copy()
        flip = rng.random(n) < 0.08
        pred[flip & (gt == 5001)] = 5002        # chair_1 -> chair_2 bleed
        pred[flip & (gt == 7003)] = 1000        # table -> wall bleed
        if s == 1:
            pred[700:760] = 5001                 # partial instance merge
        for task in ("semantic_label", "instance_transfer",
                     "semantic_instance"):
            vals_gt = gt // 1000 if task == "semantic_label" else gt
            vals_pr = pred // 1000 if task == "semantic_label" else pred
            _write_ids(str(ev / task / "gt_segmentation" / f"{scan}.txt"),
                       vals_gt)
            if task != "semantic_instance":
                _write_ids(str(ev / task / "predictions" / f"{scan}.txt"),
                           vals_pr)
        # semantic_instance predictions: index file + binary masks
        si = ev / "semantic_instance" / "predictions"
        masks = si / "predicted_masks"
        os.makedirs(masks, exist_ok=True)
        lines = []
        for iid, conf in ((5001, 0.9), (5002, 0.7), (7003, 0.85)):
            mask = (pred == iid).astype(np.int64)
            name = f"{scan}_{iid % 1000:03d}.txt"
            _write_ids(str(masks / name), mask)
            lines.append(f"predicted_masks/{name} {iid // 1000} {conf:f}\n")
        with open(si / f"{scan}.txt", "w") as f:
            f.writelines(lines)
    return str(root)


def test_semantic_label_xcheck(eval_root):
    xc = _load_xcheck()
    res = xc.xcheck_semantic_label(os.path.join(eval_root, "eval"))
    assert res["ok"], res["mismatches"]
    assert res["n_classes_present"] >= 3
    assert 0.0 < res["ref_mIoU"] < 1.0  # the noise must actually bite


def test_instance_transfer_xcheck(eval_root):
    xc = _load_xcheck()
    res = xc.xcheck_instance_transfer(os.path.join(eval_root, "eval"),
                                      eval_root)
    assert res["ok"], res["mismatches"]
    assert res["n_scans"] == 2
    assert 0.0 < res["ref_avg_mIoU"] < 1.0


def test_semantic_instance_xcheck(eval_root):
    xc = _load_xcheck()
    res = xc.xcheck_semantic_instance(os.path.join(eval_root, "eval"))
    assert res["ok"], res["mismatches"]
    assert np.isfinite(res["ref_all_ap"])
    assert 0.0 < res["ref_all_ap_50%"] <= 1.0
