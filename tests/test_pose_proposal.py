"""M4 tests: pose_proposal stage vs the reference binary, plus voxel overlap."""

import os
import subprocess

import numpy as np
import pytest

from rescan_tpu.io import rsdb as rsdbio
from rescan_tpu.ops import voxel
from rescan_tpu.core.pointcloud import PointCloud
from rescan_tpu.utils import synthetic

REF_BIN = "/tmp/ref_bin"
HAS_ORACLE = os.path.exists(os.path.join(REF_BIN, "pose_proposal"))


def _tiny_pair(d):
    spec = synthetic.SceneSpec(room_size=(1.6, 1.6), wall_height=0.9, objects=[
        ("chair", (0.45, 0.45), (0.35, 0.5, 0.35), 0.0),
        ("table", (1.1, 1.0), (0.5, 0.4, 0.35), 0.0),
    ])
    synthetic.save_scene_ply(str(d / "scan_000.ply"), spec, resolution=6)
    spec2 = synthetic.moved_scene_spec(spec, (0.25, 0.15), which=0)
    synthetic.save_scene_ply(str(d / "scan_001.ply"), spec2, resolution=6, seed=1)
    synthetic.write_class_file(str(d / "nyu40_classes.txt"))
    return spec, spec2


def test_overlap_factor_identity_and_disjoint(tmp_path):
    spec, _ = _tiny_pair(tmp_path)
    pc = PointCloud.from_ply(str(tmp_path / "scan_000.ply"))
    chair = pc.extract_by_ids(0, "instance_ids", [3], compute_levels=True)
    eye = np.eye(4, dtype=np.float32)
    assert voxel.overlap_factor(chair, eye, chair, eye) == pytest.approx(1.0)
    far = eye.copy()
    far[:3, 3] = [10, 0, 0]
    assert voxel.overlap_factor(chair, eye, chair, far) == 0.0
    # small shift: partial overlap strictly between 0 and 1
    shift = eye.copy()
    shift[:3, 3] = [0.1, 0, 0]
    ov = voxel.overlap_factor(chair, eye, chair, shift)
    assert 0.0 < ov < 1.0


def test_overlap_engine_agreement(tmp_path):
    """The native overlap-counts kernel must match the numpy engine
    EXACTLY (same rasterization floats, same even-odd fill) for random
    relative poses, with and without interior fill."""
    spec, _ = _tiny_pair(tmp_path)
    pc = PointCloud.from_ply(str(tmp_path / "scan_000.ply"))
    chair = pc.extract_by_ids(0, "instance_ids", [3], compute_levels=True)
    eye = np.eye(4, dtype=np.float32)
    rng = np.random.default_rng(99)
    for _ in range(12):
        th = rng.random() * 6.28
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                              [-np.sin(th), 0, np.cos(th)]], np.float32)
        T[:3, 3] = (rng.random(3).astype(np.float32) - 0.5) * 0.3
        for vi in (True, False):
            a = voxel.overlap_factor(chair, eye, chair, T,
                                     voxelize_inside=vi, engine="native")
            b = voxel.overlap_factor(chair, eye, chair, T,
                                     voxelize_inside=vi, engine="numpy")
            assert a == b


def test_occupancy_fill_box():
    """A hollow voxel box gets its interior filled."""
    g = np.zeros((8, 8, 8), np.uint8)
    g[2:6, 2:6, 2:6] = voxel.BOUNDARY
    g[3:5, 3:5, 3:5] = voxel.FREE
    filled = voxel.fill_occupancy(g)
    assert (filled[3:5, 3:5, 3:5] == voxel.INSIDE).all()
    assert (filled[0, :, :] == voxel.FREE).all()


@pytest.mark.parametrize("scene_kind", ["clean", "noisy"])
def test_occupancy_prune_is_exact(tmp_path, scene_kind):
    """The occupancy prune claims to be an exact conservative upper bound
    (SceneOccupancy docstring): the grid search with the prune ON must
    return the IDENTICAL proposal set as with the prune OFF — including on
    a non-ideal scan (rotated room, sensor noise, jittered normals, sector
    occlusion; VERDICT r3 item 5's exactness-under-noise requirement)."""
    from rescan_tpu import config
    from rescan_tpu.ops import search
    from rescan_tpu.pipeline import pose_proposal as pp

    if scene_kind == "noisy":
        spec = synthetic.SceneSpec(
            room_size=(1.6, 1.6), wall_height=0.9,
            objects=[("chair", (0.45, 0.45), (0.35, 0.5, 0.35), 0.3),
                     ("table", (1.1, 1.0), (0.5, 0.4, 0.35), 0.0,
                      "cylinder")],
            room_rotation=np.deg2rad(15.0))
        synthetic.save_scene_ply(str(tmp_path / "scan_000.ply"), spec,
                                 resolution=6, noise_sigma=0.003,
                                 normal_jitter_deg=6.0)
        spec2 = synthetic.moved_scene_spec(spec, (0.25, 0.15), which=0)
        synthetic.save_scene_ply(str(tmp_path / "scan_001.ply"), spec2,
                                 resolution=6, seed=1, noise_sigma=0.003,
                                 normal_jitter_deg=6.0,
                                 occlusion=(2.3, np.pi / 4))
        synthetic.write_class_file(str(tmp_path / "nyu40_classes.txt"))
    else:
        _tiny_pair(tmp_path)
    scene = PointCloud.from_ply(str(tmp_path / "scan_001.ply"))
    base = PointCloud.from_ply(str(tmp_path / "scan_000.ply"))
    obj = base.extract_by_ids(0, "instance_ids", [3], compute_levels=True)
    # recenter like seg2rsdb does (dynamic objects live at the XZ origin)
    c = obj.centroid(0).copy()
    c[1] = 0.0
    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = -c
    obj.transform(T)

    slvl = config.SCORE_SEARCH_LVL
    grid = search.build_index(scene.pos(slvl),
                              config.SCORE_SEARCH_RADII[slvl],
                              normals=scene.nrm(slvl))
    occ = pp.SceneOccupancy(scene.pos(slvl),
                            config.SCORE_SEARCH_RADII[slvl],
                            scene_nrm=scene.nrm(slvl))
    p_off, s_off = pp.propose_poses_for_object(obj, grid, scene.bbox,
                                               occupancy=None)
    p_on, s_on = pp.propose_poses_for_object(obj, grid, scene.bbox,
                                             occupancy=occ)
    assert len(p_on) == len(p_off)
    np.testing.assert_allclose(p_on, p_off, atol=1e-6)
    np.testing.assert_allclose(s_on, s_off, atol=1e-6)
    # and the prune actually prunes (otherwise this test is vacuous)
    lvl = config.GRID_SEARCH_LEVELS[0]
    from rescan_tpu.ops import score as score_ops
    hyps, _, _ = score_ops.grid_search_hypotheses(scene.bbox[0],
                                                  scene.bbox[1])
    ub = occ.score_upper_bound(obj.pos(lvl), hyps, obj_nrm=obj.nrm(lvl))
    kept = (ub >= config.SCORE_THRESHOLDS[lvl]).mean()
    assert kept < 0.9, f"prune kept {kept:.0%} — not pruning anything"


@pytest.mark.slow
@pytest.mark.skipif(not HAS_ORACLE, reason="reference binaries not built")
def test_pose_proposal_vs_reference(tmp_path):
    """Full-stage parity: our pose_proposal and the reference binary process
    the same rescan; top-1 proposals must agree in pose (< 2 cm / matching
    rotation) and score (< 0.02)."""
    from rescan_tpu.pipeline import seg2rsdb, pose_proposal

    d = tmp_path
    _tiny_pair(d)
    cls = str(d / "nyu40_classes.txt")
    cwd = os.getcwd()
    os.chdir(d)
    try:
        seg2rsdb.main(["scan_000.ply", cls, "scan_000.rsdb"])
        pose_proposal.run("scan_000.rsdb", "scan_001.ply", "scan_001_pp.rsdb")
        os.makedirs("ref", exist_ok=True)
        subprocess.run([f"{REF_BIN}/seg2rsdb", "scan_000.ply", cls,
                        "ref/scan_000.rsdb"], check=True, capture_output=True,
                       timeout=1200)
        # NOTE: the reference pose_proposal exits(-1) unless -v is passed
        # (apps/pose_proposal/main.cpp:133-141 gates success on verbose)
        subprocess.run([f"{REF_BIN}/pose_proposal", "ref/scan_000.rsdb",
                        "scan_001.ply", "ref/scan_001_pp.rsdb", "-v"],
                       check=True, capture_output=True, timeout=1800)
        ours_p, ours_s = rsdbio.load_pose_proposals(
            "scan_001_pp/scan_001_pp.bin")
        ref_p, ref_s = rsdbio.load_pose_proposals(
            "ref/scan_001_pp/scan_001_pp.bin")
    finally:
        os.chdir(cwd)

    assert len(ours_p) == len(ref_p)
    for i in range(len(ours_p)):
        if len(ref_p[i]) == 0:
            assert len(ours_p[i]) == 0
            continue
        assert len(ours_p[i]) >= 1
        dt = np.linalg.norm(ours_p[i][0][:3, 3] - ref_p[i][0][:3, 3])
        dr = np.abs(ours_p[i][0][:3, :3] - ref_p[i][0][:3, :3]).max()
        assert dt < 0.02, f"object {i}: top-1 translation differs by {dt}"
        assert dr < 0.05, f"object {i}: top-1 rotation differs by {dr}"
        assert abs(ours_s[i][0] - ref_s[i][0]) < 0.02
