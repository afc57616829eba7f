"""Plane detection, graph segmentation, and the symmetric alignment score."""

import numpy as np

from rescan_tpu.core.pointcloud import PointCloud
from rescan_tpu.ops import planes
from rescan_tpu.utils import synthetic


def _room_cloud(tmp_path):
    # production ingest path: mesh PLY -> area-weighted resample -> levels
    spec = synthetic.default_scene_spec()
    path = str(tmp_path / "room.ply")
    synthetic.save_scene_ply(path, spec, resolution=20)
    return PointCloud.from_ply(path)


def test_detect_planes_finds_floor_and_walls(tmp_path):
    scene = _room_cloud(tmp_path)
    scene.levels[0]["class_ids"][:] = 0  # forget GT labels
    models = planes.detect_planes(scene)
    planes.compute_plane_features(scene, models)
    planes.classify_planes(scene, models)
    cls = scene.levels[0]["class_ids"]
    assert (cls == 2).sum() > 400   # floor points labelled
    # faithful reference behavior: on a first scan all qualities default to
    # 1.0 (rs_pointcloud.h:775), so plane saliency is 1.0 and the wall
    # branch (requires saliency < 0.9) never fires — walls stay unlabelled
    # until saliency has been computed from proposals
    assert (cls == 1).sum() == 0
    assert sum(m.valid for m in models) >= 1  # the floor plane


def test_segment_graph_two_clusters():
    # two chains bridged by one heavy edge: FH with small c keeps them apart
    edges, weights = [], []
    for i in range(9):
        if i != 4:
            edges.append((i, i + 1))
            weights.append(0.1)
    edges.append((4, 5))
    weights.append(5.0)
    labels = planes.segment_graph(10, np.array(edges), np.array(weights), 0.5)
    assert labels[0] == labels[4]
    assert labels[5] == labels[9]
    assert labels[0] != labels[5]
    # large c merges everything
    labels_all = planes.segment_graph(10, np.array(edges),
                                      np.array(weights), 100.0)
    assert len(np.unique(labels_all)) == 1
    # labels are dense and first-occurrence ordered
    assert labels[0] == 0 and labels.max() == len(np.unique(labels)) - 1


def test_pt2pt_alignment_score():
    rng = np.random.default_rng(3)
    pts = rng.uniform(0, 1, (800, 3)).astype(np.float32)
    lvl = {
        "positions": pts,
        "normals": np.tile(np.array([0, 1, 0], np.float32), (800, 1)),
        "colors": np.zeros((800, 3), np.float32),
        "radii": np.full(800, 0.01, np.float32),
        "qualities": np.ones(800, np.float32),
        "class_ids": np.zeros(800, np.int32),
        "instance_ids": np.zeros(800, np.int32),
    }
    a = PointCloud.from_arrays(dict(lvl))
    b = PointCloud.from_arrays(dict(lvl))
    ident = np.eye(4, dtype=np.float32)
    s_same = a.pt2pt_alignment_score(b, ident, 0.05, 0)
    assert s_same > 0.99  # every point matches itself at d=0

    off = np.eye(4, dtype=np.float32)
    off[0, 3] = 0.03  # within radius: exp(-0.03^2 / (2*0.1^2)) ~ 0.956
    s_off = a.pt2pt_alignment_score(b, off, 0.05, 0)
    assert 0.90 < s_off < s_same

    far = np.eye(4, dtype=np.float32)
    far[0, 3] = 10.0
    assert a.pt2pt_alignment_score(b, far, 0.05, 0) == 0.0
