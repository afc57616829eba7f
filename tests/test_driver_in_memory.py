"""The fused in-memory driver path must produce BYTE-IDENTICAL outputs to
the stage-per-reload path (the reference's process-boundary behavior):
arrangement poses are snapped to the .rsdb text precision after each save,
and every cloud reload is bit-exact by construction."""

import filecmp
import os

import pytest

from rescan_tpu.pipeline import driver
from rescan_tpu.utils import synthetic


def _build_sequence(root):
    seq = root / "roomA"
    gt = seq / "gt_segmentation"
    gt.mkdir(parents=True)
    spec0 = synthetic.SceneSpec(room_size=(1.6, 1.6), wall_height=0.9, objects=[
        ("chair", (0.45, 0.45), (0.35, 0.5, 0.35), 0.0),
        ("table", (1.1, 1.0), (0.5, 0.4, 0.35), 0.0)])
    spec1 = synthetic.moved_scene_spec(spec0, (0.25, 0.15), which=0)
    spec2 = synthetic.moved_scene_spec(spec1, (-0.1, 0.3), which=0)
    for i, spec in enumerate([spec0, spec1, spec2]):
        synthetic.save_scene_ply(str(gt / f"scan_{i:03d}.ply"), spec,
                                 resolution=6, seed=i)
    synthetic.write_class_file(str(root / "nyu40_classes.txt"))


@pytest.mark.slow
def test_in_memory_equals_stage_reload(tmp_path):
    roots = {}
    for mode in ("mem", "disk"):
        root = tmp_path / mode
        root.mkdir()
        _build_sequence(root)
        cwd = os.getcwd()
        os.chdir(root)
        try:
            driver.run_sequence("roomA", str(root / "nyu40_classes.txt"),
                                in_memory=(mode == "mem"))
        finally:
            os.chdir(cwd)
        roots[mode] = root

    for rel in ("roomA/scan_001_pp.rsdb", "roomA/scan_001.rsdb",
                "roomA/scan_002_pp.rsdb", "roomA/scan_002.rsdb",
                "roomA/predictions/scan_001.ply",
                "roomA/predictions/scan_002.ply",
                "roomA/scan_002_pp/scan_002_pp.bin"):
        a = roots["mem"] / rel
        b = roots["disk"] / rel
        assert a.exists() and b.exists(), rel
        assert filecmp.cmp(str(a), str(b), shallow=False), \
            f"{rel} differs between in-memory and stage-reload paths"
