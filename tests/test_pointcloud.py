"""M1 tests: the tensor point-cloud data model vs the reference ingest path."""

import os
import subprocess

import numpy as np
import pytest

from rescan_tpu.core.pointcloud import PointCloud, uniform_resample
from rescan_tpu.io import ply as plyio
from rescan_tpu.utils import synthetic

REF_BIN = "/tmp/ref_bin"
HAS_LEVELS_ORACLE = os.path.exists(os.path.join(REF_BIN, "levels_dump"))


@pytest.fixture(scope="module")
def small_scene(tmp_path_factory):
    d = tmp_path_factory.mktemp("scene")
    path = str(d / "scan.ply")
    synthetic.save_scene_ply(path, synthetic.default_scene_spec(), resolution=8)
    return path


@pytest.mark.skipif(not HAS_LEVELS_ORACLE, reason="levels oracle not built")
def test_ingest_bit_exact_vs_reference(small_scene, tmp_path):
    """Full ingest parity: load + resample + all 5 LoD levels must be
    bit-identical to the reference (positions, class ids, instance ids)."""
    dump = str(tmp_path / "levels.bin")
    subprocess.run([f"{REF_BIN}/levels_dump", small_scene, dump],
                   check=True, timeout=600)
    pc = PointCloud.from_ply(small_scene)
    with open(dump, "rb") as f:
        for lvl in range(5):
            n = int(np.frombuffer(f.read(8), dtype=np.int64)[0])
            pos = np.frombuffer(f.read(12 * n), dtype=np.float32).reshape(n, 3)
            cls = np.frombuffer(f.read(4 * n), dtype=np.int32)
            ins = np.frombuffer(f.read(4 * n), dtype=np.int32)
            assert pc.n_pts(lvl) == n, f"level {lvl} count"
            np.testing.assert_array_equal(pc.pos(lvl), pos, err_msg=f"lvl{lvl} pos")
            np.testing.assert_array_equal(pc.levels[lvl]["class_ids"], cls)
            np.testing.assert_array_equal(pc.levels[lvl]["instance_ids"], ins)


def test_level_monotone_counts(small_scene):
    pc = PointCloud.from_ply(small_scene)
    counts = [pc.n_pts(l) for l in range(5)]
    assert all(counts[i] > counts[i + 1] for i in range(4))


def test_resample_density(small_scene):
    cloud = plyio.load_surfel_ply(small_scene)
    faces = cloud.pop("faces")
    out = uniform_resample(cloud, faces)
    # n = 0.5 * sum(|cross|) * 12800 = 12800 per m^2 of true triangle area
    # (the reference's "area" is the unnormalized cross norm = 2x true area,
    # rs_pointcloud.h:1151,1157-1158)
    p = cloud["positions"]
    v0, v1, v2 = p[faces[:, 0]], p[faces[:, 1]], p[faces[:, 2]]
    area = 0.5 * np.linalg.norm(np.cross(v1 - v0, v2 - v0), axis=1).sum()
    expect = 12800 * area
    assert abs(len(out["positions"]) - expect) / expect < 0.01


def test_extract_by_ids(small_scene):
    pc = PointCloud.from_ply(small_scene)
    sub = pc.extract_by_ids(0, "instance_ids", [3])
    assert sub is not None
    assert (sub.levels[0]["instance_ids"] == 3).all()
    none = pc.extract_by_ids(0, "instance_ids", [9999])
    assert none is None


def test_transform_roundtrip(small_scene):
    pc = PointCloud.from_ply(small_scene)
    p0 = pc.pos(0).copy()
    th = 0.3
    c, s = np.cos(th), np.sin(th)
    m = np.array([[c, 0, s, 1.0], [0, 1, 0, 2.0], [-s, 0, c, 3.0],
                  [0, 0, 0, 1]], dtype=np.float32)
    pc.transform(m)
    minv = np.linalg.inv(m.astype(np.float64)).astype(np.float32)
    pc.transform(minv)
    np.testing.assert_allclose(pc.pos(0), p0, atol=1e-4)


def test_merge_deterministic(rng):
    def mk(n, seed):
        r = np.random.default_rng(seed)
        nrm = r.normal(size=(n, 3)).astype(np.float32)
        nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
        return PointCloud.from_arrays({
            "positions": r.uniform(0, 1, (n, 3)).astype(np.float32),
            "normals": nrm,
            "colors": r.uniform(0, 1, (n, 3)).astype(np.float32),
            "radii": np.full(n, 0.01, np.float32),
            "qualities": np.ones(n, np.float32),
            "class_ids": np.zeros(n, np.int32),
            "instance_ids": np.zeros(n, np.int32),
        }, compute_levels=False)

    a, b = mk(500, 1), mk(300, 2)
    m1 = a.merge_with(b)
    m2 = mk(500, 1).merge_with(mk(300, 2))
    assert m1.n_pts(0) == 800
    np.testing.assert_array_equal(m1.pos(0), m2.pos(0))
    # merged contains exactly the union of points
    allp = np.concatenate([a.pos(0), b.pos(0)])
    assert set(map(tuple, m1.pos(0).tolist())) == set(map(tuple, allp.tolist()))


def test_centroid_covariance(rng):
    n = 1000
    pts = rng.normal(0, [2.0, 0.5, 1.0], (n, 3)).astype(np.float32)
    pc = PointCloud.from_arrays({
        "positions": pts, "normals": np.zeros((n, 3), np.float32),
        "colors": np.zeros((n, 3), np.float32), "radii": np.zeros(n, np.float32),
        "qualities": np.zeros(n, np.float32), "class_ids": np.zeros(n, np.int32),
        "instance_ids": np.zeros(n, np.int32)}, compute_levels=False)
    np.testing.assert_allclose(pc.centroid(0), pts.mean(0), atol=1e-5)
    d = pts - pts.mean(0)
    np.testing.assert_allclose(pc.covariance(0), d.T @ d / n, rtol=1e-4, atol=1e-5)
