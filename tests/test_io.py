"""M0 tests: PLY / .rsdb / pose-bin codecs + PRNG parity with the reference.

Oracle binaries (compiled from the reference, used as black boxes) are
expected at /tmp/ref_bin; oracle-dependent tests skip when absent.
"""

import os
import subprocess

import numpy as np
import pytest

from rescan_tpu.io import ply as plyio
from rescan_tpu.io import rsdb as rsdbio
from rescan_tpu.io import paths
from rescan_tpu.utils import rng as mshrng
from rescan_tpu.utils import synthetic

REF_BIN = "/tmp/ref_bin"
HAS_ORACLE = os.path.exists(os.path.join(REF_BIN, "seg2rsdb"))


# ---------------------------------------------------------------------------
# PRNG parity (values captured from the reference's msh_rand / alias sampler)
# ---------------------------------------------------------------------------

def test_msh_rand_u32_parity():
    g = mshrng.MshRand(12346)
    assert [g.next_u32() for _ in range(5)] == [
        1840663644, 827236888, 2434241407, 1908099599, 2377436124]


def test_msh_rand_f32_parity():
    g = mshrng.MshRand(12346)
    vals = [g.next_f32() for _ in range(5)]
    ref = [0.42856288, 0.192606091, 0.566765904, 0.444264054, 0.553539872]
    np.testing.assert_allclose(vals, ref, rtol=1e-6)


def test_discrete_distribution_parity():
    d = mshrng.MshDiscreteDistribution(np.array([1.0, 2.0, 3.0, 4.0, 0.5]), 64321)
    assert [d.sample() for _ in range(12)] == [3, 3, 1, 1, 3, 1, 1, 4, 1, 3, 2, 3]


# ---------------------------------------------------------------------------
# PLY codec
# ---------------------------------------------------------------------------

def _rand_cloud(n, rng):
    nrm = rng.normal(size=(n, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    return {
        "positions": rng.uniform(-2, 2, (n, 3)).astype(np.float32),
        "normals": nrm,
        "colors": rng.uniform(0, 1, (n, 3)).astype(np.float32),
        "radii": rng.uniform(0.001, 0.1, n).astype(np.float32),
        "class_ids": rng.integers(0, 41, n).astype(np.int32),
        "instance_ids": rng.integers(0, 100, n).astype(np.int32),
        "qualities": np.ones(n, np.float32),
    }


def test_ply_roundtrip(tmp_path, rng):
    cloud = _rand_cloud(1000, rng)
    p = str(tmp_path / "c.ply")
    plyio.save_surfel_ply(p, cloud)
    back = plyio.load_surfel_ply(p)
    np.testing.assert_array_equal(back["positions"], cloud["positions"])
    np.testing.assert_allclose(back["normals"], cloud["normals"], atol=2e-7)
    np.testing.assert_array_equal(back["class_ids"], cloud["class_ids"])
    np.testing.assert_array_equal(back["instance_ids"], cloud["instance_ids"])
    np.testing.assert_array_equal(back["radii"], cloud["radii"])
    # colors go through uint8
    np.testing.assert_allclose(back["colors"], cloud["colors"], atol=1.01 / 255)


def test_ply_roundtrip_with_faces(tmp_path):
    spec = synthetic.default_scene_spec()
    cloud = synthetic.save_scene_ply(str(tmp_path / "scene.ply"), spec)
    back = plyio.load_surfel_ply(str(tmp_path / "scene.ply"))
    np.testing.assert_array_equal(back["positions"], cloud["positions"])
    np.testing.assert_array_equal(back["faces"], cloud["faces"])
    np.testing.assert_array_equal(back["instance_ids"], cloud["instance_ids"])


def test_ply_missing_fields(tmp_path):
    """A position-only mesh gets reference defaults on load
    (rs_pointcloud.h:716-776)."""
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 0, 1]], dtype=np.float32)
    faces = np.array([[0, 1, 2]], dtype=np.int32)
    p = str(tmp_path / "min.ply")
    with open(p, "wb") as f:
        hdr = ("ply\nformat binary_little_endian 1.0\n"
               "element vertex 3\nproperty float x\nproperty float y\n"
               "property float z\nelement face 1\n"
               "property list uchar int vertex_indices\nend_header\n")
        f.write(hdr.encode())
        f.write(verts.astype("<f4").tobytes())
        f.write(np.array([3], dtype="u1").tobytes())
        f.write(faces.astype("<i4").tobytes())
    c = plyio.load_surfel_ply(p)
    np.testing.assert_allclose(c["radii"], 0.01)
    np.testing.assert_array_equal(c["class_ids"], 0)
    np.testing.assert_allclose(c["colors"], 0.5)
    # normal of this face is -y (cross((1,0,0),(0,0,1)) = (0,-1,0))
    np.testing.assert_allclose(c["normals"], [[0, -1, 0]] * 3, atol=1e-6)


@pytest.mark.skipif(not HAS_ORACLE, reason="reference binaries not built")
def test_reference_reads_our_ply(tmp_path):
    """The reference seg2rsdb must ingest our PLY output end-to-end."""
    os.makedirs(tmp_path / "seq", exist_ok=True)
    scene = str(tmp_path / "seq" / "scan_000.ply")
    synthetic.save_scene_ply(scene, synthetic.default_scene_spec(), resolution=12)
    classfile = str(tmp_path / "nyu40_classes.txt")
    synthetic.write_class_file(classfile)
    out = str(tmp_path / "seq" / "scan_000.rsdb")
    res = subprocess.run([f"{REF_BIN}/seg2rsdb", scene, classfile, out, "-v"],
                         capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, res.stdout + res.stderr
    assert os.path.exists(out)
    # and we can parse what the reference wrote
    db = rsdbio.load_rsdb(out)
    assert len(db.scenes) == 1
    assert len(db.objects) >= 4  # floor, wall, 3 furniture -> >= 4 instances
    assert db.class_table["floor"] == 2
    # reference-written model PLYs parse with our reader
    obj_ply = os.path.join(db.model_folder, db.objects[0].filename)
    cloud = plyio.load_surfel_ply(obj_ply)
    assert len(cloud["positions"]) > 0


@pytest.mark.skipif(not HAS_ORACLE, reason="reference binaries not built")
def test_rsdb_text_roundtrip_byte_exact(tmp_path):
    """Parse a reference-written .rsdb and re-serialize byte-identically."""
    os.makedirs(tmp_path / "seq", exist_ok=True)
    scene = str(tmp_path / "seq" / "scan_000.ply")
    synthetic.save_scene_ply(scene, synthetic.default_scene_spec(), resolution=10)
    classfile = str(tmp_path / "nyu40_classes.txt")
    synthetic.write_class_file(classfile)
    out = str(tmp_path / "seq" / "scan_000.rsdb")
    subprocess.run([f"{REF_BIN}/seg2rsdb", scene, classfile, out],
                   capture_output=True, check=True, timeout=600)
    db = rsdbio.load_rsdb(out)
    ours = str(tmp_path / "seq" / "scan_000.rsdb")  # same path -> same model_folder
    with open(out) as f:
        ref_text = f.read()
    rsdbio.save_rsdb(ours, db, save_objects=False)
    with open(ours) as f:
        our_text = f.read()
    assert our_text == ref_text


def test_pose_proposal_bin_roundtrip(tmp_path, rng):
    poses = [rng.normal(size=(k, 4, 4)).astype(np.float32) for k in (3, 0, 7)]
    scores = [rng.normal(size=(k,)).astype(np.float32) for k in (3, 0, 7)]
    p = str(tmp_path / "pp.bin")
    rsdbio.save_pose_proposals(p, poses, scores)
    back_p, back_s = rsdbio.load_pose_proposals(p)
    assert len(back_p) == 3
    for a, b in zip(poses, back_p):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(scores, back_s):
        np.testing.assert_array_equal(a, b)


def test_arrangement_bin_roundtrip(tmp_path, rng):
    arr = [rsdbio.Placement(i, 0, i * 2, 1, rng.normal(size=(4, 4)).astype(np.float32),
                            float(i) * 0.5) for i in range(5)]
    p = str(tmp_path / "arr.bin")
    rsdbio.save_arrangement(p, arr)
    back = rsdbio.load_arrangement(p)
    assert len(back) == 5
    for a, b in zip(arr, back):
        assert a.uidx == b.uidx and a.object_idx == b.object_idx
        np.testing.assert_array_equal(a.pose, b.pose)


def test_rsdb_pose_out_of_range_rejected(tmp_path):
    """A pose line referencing an undeclared arrangement slot must fail
    loudly (the reference parser silently indexes out of bounds)."""
    import pytest
    bad = tmp_path / "bad.rsdb"
    bad.write_text("rsdb 1.0\nclass wall 1\nn_arrangements 1\n"
                   "pose 3 5 0 0.5   " + " ".join(["0.0"] * 16) + "\n")
    with pytest.raises(ValueError, match="arrangement 5"):
        rsdbio.load_rsdb(str(bad))


def test_paths():
    assert paths.model_folder_name("a/b/scan_001.rsdb") == "a/b/scan_001"
    assert paths.pose_proposal_filename("a/b/scan_001.rsdb") == \
        "a/b/scan_001/scan_001.bin"
    assert paths.extract_method_name("seq/gt_segmentation/scan.ply") == \
        "gt_segmentation"
