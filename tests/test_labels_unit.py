"""Unit guards for the label-transfer semantics and the smoothing-graph
engine dispatch (device kernel on CPU vs native host grid — the TPU
backend uses the host grid; both must produce the same edge set)."""

import numpy as np
import pytest

from rescan_tpu import config
from rescan_tpu.core import native
from rescan_tpu.core.pointcloud import PointCloud
from rescan_tpu.io.rsdb import Placement, RsObject, Rsdb, RsScene
from rescan_tpu.ops import labels as labels_ops
from rescan_tpu.utils import synthetic


def test_knn_engines_agree(rng):
    """hashgrid.radius_knn (device) and native.HostGrid.radius_search must
    return the same neighbor sets (order may differ on exact ties)."""
    import jax.numpy as jnp

    from rescan_tpu.ops import hashgrid

    pts = rng.uniform(0, 1.0, (3000, 3)).astype(np.float32)
    r, k = 0.08, 8
    grid_d = hashgrid.build_grid(pts, r)
    idx_d, d2_d, cnt_d = hashgrid.radius_knn(grid_d, jnp.asarray(pts), r, k)
    idx_d, d2_d, cnt_d = map(np.asarray, (idx_d, d2_d, cnt_d))
    grid_h = native.HostGrid(pts, r)
    idx_h, d2_h, cnt_h = grid_h.radius_search(pts, r, k)

    np.testing.assert_array_equal(cnt_d, cnt_h)
    for i in range(0, len(pts), 97):
        c = cnt_h[i]
        assert set(idx_d[i, :c]) == set(idx_h[i, :c]), f"query {i}"
        np.testing.assert_allclose(np.sort(d2_d[i, :c]),
                                   np.sort(d2_h[i, :c]), rtol=1e-5)


def test_label_transfer_nearest_then_gate(tmp_path):
    """The device path must preserve the reference's nearest-THEN-gate
    semantics (rs_pointcloud_filters.cpp:758-771): a scene point whose
    NEAREST object neighbor fails the 70-degree gate stays unlabelled even
    when a farther in-radius neighbor would pass."""
    spec = synthetic.SceneSpec(room_size=(1.6, 1.6), wall_height=0.9, objects=[
        ("chair", (0.45, 0.45), (0.35, 0.5, 0.35), 0.0)])
    path = str(tmp_path / "scene.ply")
    synthetic.save_scene_ply(path, spec, resolution=6)
    scene = PointCloud.from_ply(path)
    db = Rsdb()
    db.class_table = {n: i for i, n in enumerate(synthetic.NYU40_CLASSES)}
    sub = scene.extract_by_ids(0, "instance_ids", [3], compute_levels=True)
    db.objects.append(RsObject(uidx=3, filename="o3.ply", class_idx=5,
                               cloud=sub))
    db.scenes.append(RsScene(uidx=0, arrangement_idx=0, scn_filename=path,
                             cloud=scene))
    arr = [Placement(3, 0, 0, 0, np.eye(4, dtype=np.float32), 0.9)]

    labels_ops.arrangement_to_labels(db, scene, arr)
    L = scene.levels[config.LABEL_LVL]
    claimed = L["instance_ids"] == 3
    assert claimed.sum() > 0

    # brute-force reference: per scene point, nearest object point within
    # radius; accept only if ITS |normal dot| passes the gate
    pts = scene.pos(config.LABEL_LVL)
    nrm = scene.nrm(config.LABEL_LVL)
    opts = sub.pos(config.LABEL_LVL)
    onrm = sub.nrm(config.LABEL_LVL)
    r = config.LABEL_TRANSFER_STATIC_RADIUS_SCALE * config.LABEL_TRANSFER_RADIUS
    cos_gate = np.cos(np.deg2rad(config.LABEL_TRANSFER_MAX_ANGLE_DEG))
    bmin = opts.min(axis=0) - r
    bmax = opts.max(axis=0) + r
    cand = np.where(((pts >= bmin) & (pts <= bmax)).all(axis=1))[0]
    expect = np.zeros(len(pts), bool)
    for i in cand:
        d2 = ((opts - pts[i]) ** 2).sum(axis=1)
        j = int(np.argmin(d2))
        if d2[j] < r * r:
            qn = nrm[i] / max(np.linalg.norm(nrm[i]), 1e-30)
            on = onrm[j] / max(np.linalg.norm(onrm[j]), 1e-30)
            expect[i] = abs(float(qn @ on)) > cos_gate
    agreement = (claimed == expect).mean()
    assert agreement > 0.999, f"label agreement {agreement}"
