"""Non-ideal synthetic scene generator (VERDICT r3 item 5): sensor noise,
normal jitter, sector occlusion, rotated rooms, cylinder + concave shapes."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rescan_tpu.io import ply as plyio  # noqa: E402
from rescan_tpu.utils import synthetic  # noqa: E402


def _mesh(spec, **kw):
    return synthetic.make_scene_mesh(spec, resolution=12, **kw)


def test_cylinder_side_normals_are_radial():
    spec = synthetic.SceneSpec(room_size=(2.0, 2.0), wall_height=1.0,
                               objects=[("table", (1.0, 1.0),
                                         (0.6, 0.8, 0.6), 0.0, "cylinder")])
    m = _mesh(spec)
    nrm = plyio.compute_vertex_normals(m["positions"], m["faces"])
    on_cyl = m["instance_ids"] == 3
    pos = m["positions"][on_cyl]
    n = nrm[on_cyl]
    side = (pos[:, 1] > 0.1) & (pos[:, 1] < 0.7)  # away from the caps
    radial = pos[side] - np.array([1.0, 0.0, 1.0], np.float32)
    radial[:, 1] = 0
    radial /= np.linalg.norm(radial, axis=1, keepdims=True)
    cos = (n[side] * radial).sum(axis=1)
    assert np.median(cos) > 0.95  # outward radial normals
    # curved: footprint is round, radius ~0.3 everywhere
    r = np.linalg.norm(radial * 0 + (pos[side] - [1.0, 0, 1.0]) * [1, 0, 1],
                       axis=1)
    assert abs(np.median(r) - 0.3) < 0.02


def test_lshape_is_concave():
    spec = synthetic.SceneSpec(room_size=(3.0, 3.0), wall_height=1.0,
                               objects=[("sofa", (1.5, 1.5),
                                         (1.6, 0.8, 0.7), 0.0, "lshape")])
    m = _mesh(spec)
    pos = m["positions"][m["instance_ids"] == 3]
    # the notch corner (+x, +z quadrant of the footprint) must be EMPTY
    # while the bounding box spans it -> concave
    rel = pos - np.array([1.5, 0, 1.5], np.float32)
    assert rel[:, 0].max() > 0.7 and rel[:, 2].max() > 0.25  # bbox spans
    in_notch = (rel[:, 0] > 0.35) & (rel[:, 2] > 0.15)
    assert in_notch.sum() == 0, "vertices inside the concave notch"


def test_room_rotation_rotates_walls():
    base = synthetic.SceneSpec(room_size=(2.0, 2.0), wall_height=1.0)
    rot = synthetic.SceneSpec(room_size=(2.0, 2.0), wall_height=1.0,
                              room_rotation=np.deg2rad(15.0))
    m0, m1 = _mesh(base), _mesh(rot)
    w0 = m0["positions"][m0["class_ids"] == 1]
    w1 = m1["positions"][m1["class_ids"] == 1]
    # an axis-aligned room's walls have x==const or z==const planes; the
    # rotated one must not (x/z extents grow beyond the room)
    assert w1[:, 0].max() - w1[:, 0].min() > (w0[:, 0].max() - w0[:, 0].min()
                                              + 0.2)
    nrm = plyio.compute_vertex_normals(m1["positions"], m1["faces"])
    wn = nrm[m1["class_ids"] == 1]
    axis_aligned = (np.abs(np.abs(wn[:, 0]) - 1) < 1e-3) | \
        (np.abs(np.abs(wn[:, 2]) - 1) < 1e-3)
    assert axis_aligned.mean() < 0.1  # normals rotated off-axis


def test_sector_occlusion_removes_wedge(tmp_path):
    spec = synthetic.SceneSpec(room_size=(2.0, 2.0), wall_height=1.0)
    full = synthetic.save_scene_ply(str(tmp_path / "a.ply"), spec,
                                    resolution=12)
    occ = synthetic.save_scene_ply(str(tmp_path / "b.ply"), spec,
                                   resolution=12,
                                   occlusion=(0.0, np.pi / 3))
    assert len(occ["positions"]) < 0.95 * len(full["positions"])
    ang = np.arctan2(occ["positions"][:, 2] - 1.0,
                     occ["positions"][:, 0] - 1.0)
    assert (np.abs(ang) < np.pi / 6 - 1e-6).sum() == 0
    # faces reindexed consistently: all indices in range
    assert occ["faces"].max() < len(occ["positions"])
    # labels stay aligned with positions
    assert len(occ["class_ids"]) == len(occ["positions"])


def test_position_noise_keeps_normals_clean(tmp_path):
    spec = synthetic.SceneSpec(room_size=(2.0, 2.0), wall_height=1.0)
    c = synthetic.save_scene_ply(str(tmp_path / "n.ply"), spec, resolution=12,
                                 noise_sigma=0.004)
    base = synthetic.save_scene_ply(str(tmp_path / "c.ply"), spec,
                                    resolution=12)
    d = np.linalg.norm(c["positions"] - base["positions"], axis=1)
    assert 0.003 < d.mean() < 0.012  # noise applied
    # normals computed from the CLEAN mesh (sensor model)
    np.testing.assert_array_equal(c["normals"], base["normals"])


def test_normal_jitter_tilts_by_sigma(tmp_path):
    spec = synthetic.SceneSpec(room_size=(2.0, 2.0), wall_height=1.0)
    j = synthetic.save_scene_ply(str(tmp_path / "j.ply"), spec, resolution=12,
                                 normal_jitter_deg=8.0)
    base = synthetic.save_scene_ply(str(tmp_path / "c.ply"), spec,
                                    resolution=12)
    cos = (j["normals"] * base["normals"]).sum(axis=1).clip(-1, 1)
    ang = np.degrees(np.arccos(cos))
    assert 5.0 < ang.mean() < 16.0  # ~8 deg tilt (2D tangent noise)
    assert np.allclose(np.linalg.norm(j["normals"], axis=1), 1.0, atol=1e-5)


def test_moved_spec_preserves_shape_and_rotation():
    spec = synthetic.noisy_scene_spec()
    mv = synthetic.moved_scene_spec(spec, (0.3, 0.2), which=1)
    assert mv.room_rotation == spec.room_rotation
    assert synthetic._obj_fields(mv.objects[1])[4] == "cylinder"
    assert synthetic._obj_fields(mv.objects[3])[4] == "lshape"
    assert mv.objects[1][1][0] == spec.objects[1][1][0] + 0.3


def test_noisy_scene_ingests(tmp_path):
    """The full non-ideal scan (rotation + shapes + noise + occlusion)
    round-trips through PLY save/load with consistent fields."""
    spec = synthetic.noisy_scene_spec(room=2.5)
    cloud = synthetic.save_scene_ply(
        str(tmp_path / "noisy.ply"), spec, resolution=10, noise_sigma=0.003,
        normal_jitter_deg=5.0, occlusion=(2.0, np.pi / 4))
    back = plyio.load_surfel_ply(str(tmp_path / "noisy.ply"))
    assert len(back["positions"]) == len(cloud["positions"])
    assert set(np.unique(back["instance_ids"])) >= {0, 1, 3, 4, 5, 6, 7}


def test_pose_error_is_rigid_and_small(tmp_path):
    """pose_error applies ONE rigid transform to the whole scan: pairwise
    distances are preserved, displacement magnitude matches the knob, and
    normals rotate with the geometry (r5 item 7)."""
    spec = synthetic.SceneSpec(room_size=(2.0, 2.0), wall_height=1.0,
                               objects=[("chair", (0.6, 0.6),
                                         (0.4, 0.5, 0.4), 0.0)])
    base = synthetic.save_scene_ply(str(tmp_path / "a.ply"), spec,
                                    resolution=8, seed=1)
    pert = synthetic.save_scene_ply(str(tmp_path / "b.ply"), spec,
                                    resolution=8, seed=1,
                                    pose_error=(0.01, 1.0))
    a, b = base["positions"], pert["positions"]
    assert a.shape == b.shape
    # rigid: pairwise distances preserved
    ii = np.arange(0, len(a) - 1, 97)
    da = np.linalg.norm(a[ii] - a[ii + 1], axis=1)
    db = np.linalg.norm(b[ii] - b[ii + 1], axis=1)
    np.testing.assert_allclose(da, db, atol=1e-5)
    # small but nonzero: cm-scale displacement
    disp = np.linalg.norm(a - b, axis=1)
    assert 1e-4 < np.median(disp) < 0.2
    # normals rotated consistently: same angle between normal pairs
    na, nb = base["normals"], pert["normals"]
    ca = (na[ii] * na[ii + 1]).sum(1)
    cb = (nb[ii] * nb[ii + 1]).sum(1)
    np.testing.assert_allclose(ca, cb, atol=1e-4)


def test_density_falloff_drops_far_faces(tmp_path):
    """density_falloff removes proportionally more mesh AREA far from the
    scanner (the quantity seg2rsdb's uniform-per-area resample sees),
    keeps near geometry intact, and leaves no orphan vertices."""
    spec = synthetic.SceneSpec(room_size=(4.0, 4.0), wall_height=2.0,
                               objects=[("chair", (1.0, 1.0),
                                         (0.5, 0.8, 0.5), 0.0)])
    base = synthetic.save_scene_ply(str(tmp_path / "a.ply"), spec,
                                    resolution=12, seed=2)
    thin = synthetic.save_scene_ply(str(tmp_path / "b.ply"), spec,
                                    resolution=12, seed=2,
                                    density_falloff=((1.0, 1.0), 0.4))
    assert len(thin["positions"]) < len(base["positions"])
    # no orphan vertices
    used = np.zeros(len(thin["positions"]), bool)
    used[thin["faces"].reshape(-1)] = True
    assert used.all()

    def area_ratio(scan, ref, sel_fn):
        def area(m):
            pos, f = m["positions"], m["faces"]
            cen = pos[f].mean(axis=1)
            tri = np.cross(pos[f[:, 1]] - pos[f[:, 0]],
                           pos[f[:, 2]] - pos[f[:, 0]])
            a = 0.5 * np.linalg.norm(tri, axis=1)
            return a[sel_fn(cen)].sum()
        return area(scan) / max(area(ref), 1e-9)

    near = lambda c: np.hypot(c[:, 0] - 1.0, c[:, 2] - 1.0) < 1.0
    far = lambda c: np.hypot(c[:, 0] - 1.0, c[:, 2] - 1.0) > 2.5
    keep_near = area_ratio(thin, base, near)
    keep_far = area_ratio(thin, base, far)
    assert keep_near > 0.95          # full density within 1 m
    assert keep_far < keep_near - 0.2  # monotone falloff with distance
