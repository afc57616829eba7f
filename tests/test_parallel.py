"""Sharded pose search / ICP on the 8-virtual-device CPU mesh."""

import jax
import numpy as np
import pytest

from rescan_tpu.ops import hashgrid, icp, score
from rescan_tpu.parallel import mesh as pmesh


@pytest.fixture(scope="module")
def scene(rng=None):
    r = np.random.default_rng(7)
    pts = r.uniform(0, 2, (8000, 3)).astype(np.float32)
    pts[:, 1] *= 0.1
    nrm = np.tile(np.array([[0, 1, 0]], np.float32), (8000, 1))
    return pts, nrm


def test_sharded_scores_match_single(scene):
    import jax.numpy as jnp
    pts, nrm = scene
    grid = hashgrid.build_grid(pts, 0.1, normals=nrm)
    obj = pts[:500] + np.array([0.01, 0.005, 0.0], np.float32)
    objn = nrm[:500]
    hyps = np.tile(np.eye(4, dtype=np.float32), (13, 1, 1))
    hyps[:, 0, 3] = np.linspace(-0.1, 0.1, 13)

    ref = np.asarray(score.score_hypotheses(
        grid, jnp.asarray(obj), jnp.asarray(objn),
        jnp.ones(len(obj), bool), jnp.asarray(hyps), 0.1, 0.1))

    m = pmesh.make_mesh(8, sp=2)   # 4 x 2 mesh
    out = pmesh.score_hypotheses_sharded(m, grid, obj, objn, hyps, 0.1, 0.1)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_sharded_icp_matches_single(scene):
    import jax.numpy as jnp
    pts, nrm = scene
    grid = hashgrid.build_grid(pts, 0.1, normals=nrm)
    objs = [pts[i * 500:(i + 1) * 500] + np.array([0.02, 0.01, 0], np.float32)
            for i in range(3)]
    nrms = [nrm[i * 500:(i + 1) * 500] for i in range(3)]
    pts_b, nrm_b, mask_b = icp.pad_batch(objs, nrms)
    T0 = np.tile(np.eye(4, dtype=np.float32), (3, 1, 1))

    T_ref, _ = icp.icp_align_batched(
        jnp.asarray(pts_b), jnp.asarray(nrm_b), jnp.asarray(mask_b), grid,
        jnp.asarray(T0), 0.1, np.deg2rad(60.0))

    m = pmesh.make_mesh(8, sp=1)
    T_sh, _ = pmesh.icp_refine_sharded(m, grid, pts_b, nrm_b, mask_b, T0,
                                       0.1, float(np.deg2rad(60.0)))
    for k in range(3):
        p = objs[k]
        a = p @ np.asarray(T_ref[k])[:3, :3].T + np.asarray(T_ref[k])[:3, 3]
        b = p @ T_sh[k][:3, :3].T + T_sh[k][:3, 3]
        assert float(np.abs(a - b).mean()) < 1e-3


def test_icp_dpsp_matches_single(scene):
    """Indexed ICP on the (dp, sp) mesh — pairs over dp, each pair's POINT
    axis psum-sharded over sp — vs the single-device indexed loop. psum
    reduction order differs from a flat sum, so gate on aligned point
    residuals (same tolerance as the flat-sharded test)."""
    import jax.numpy as jnp
    pts, nrm = scene
    grid = hashgrid.build_grid(pts, 0.1, normals=nrm)
    objs = [pts[:1024] + np.array([0.02, 0.01, 0], np.float32),
            pts[2000:3024] + np.array([0.015, 0.0, 0.01], np.float32)]
    nrms = [nrm[:1024], nrm[2000:3024]]
    upts, unrm, umask = icp.prep_unique_batch(objs, nrms)
    own = np.array([0, 1, 0], np.int32)
    val = np.ones(3, bool)
    T0 = np.tile(np.eye(4, dtype=np.float32), (3, 1, 1))

    T_ref, _, _ = icp.icp_align_indexed(
        jnp.asarray(upts), jnp.asarray(unrm), jnp.asarray(umask),
        jnp.asarray(own), jnp.asarray(val), grid, jnp.asarray(T0),
        0.1, np.deg2rad(60.0))
    m = pmesh.make_mesh(8, sp=2)
    T_sh, _ = pmesh.icp_refine_indexed_dpsp(
        m, grid, upts, unrm, umask, own, val, T0, 0.1,
        float(np.deg2rad(60.0)))
    for k in range(3):
        p = objs[own[k]]
        a = p @ np.asarray(T_ref[k])[:3, :3].T + np.asarray(T_ref[k])[:3, 3]
        b = p @ T_sh[k][:3, :3].T + T_sh[k][:3, 3]
        assert float(np.abs(a - b).mean()) < 1e-3


def test_refine_sp_factor():
    """sp engages exactly when pairs can't fill the mesh and each point
    shard stays >= 512."""
    assert pmesh.refine_sp_factor(16, 8192, 8) == 1
    assert pmesh.refine_sp_factor(5, 8192, 8) == 1   # pow2(5) = 8 fills
    assert pmesh.refine_sp_factor(4, 8192, 8) == 2
    assert pmesh.refine_sp_factor(2, 8192, 8) == 4
    assert pmesh.refine_sp_factor(1, 8192, 8) == 8
    assert pmesh.refine_sp_factor(1, 1024, 8) == 2   # 512-pt shard floor
    assert pmesh.refine_sp_factor(1, 512, 8) == 1


def test_mesh_uses_all_devices():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    m = pmesh.make_mesh(8, sp=2)
    assert m.shape == {"dp": 4, "sp": 2}


def test_production_stage_sharded_equals_single(tmp_path):
    """The PRODUCTION grid-search stage (propose_poses_for_object, the
    same code path pose_proposal.run drives per object) must produce the
    SAME proposal set with and without the mesh."""
    import numpy as np
    from rescan_tpu import config
    from rescan_tpu.core.pointcloud import PointCloud
    from rescan_tpu.ops import search
    from rescan_tpu.pipeline import pose_proposal as pp
    from rescan_tpu.utils import synthetic

    spec = synthetic.SceneSpec(room_size=(1.2, 1.2), wall_height=0.7,
                               objects=[("chair", (0.4, 0.4),
                                         (0.3, 0.4, 0.3), 0.0)])
    ply = str(tmp_path / "scene.ply")
    synthetic.save_scene_ply(ply, spec, resolution=5)
    scene = PointCloud.from_ply(ply)
    obj = scene.extract_by_ids(0, "instance_ids", [3], compute_levels=True)
    slvl = config.SCORE_SEARCH_LVL
    grid = search.build_index(scene.pos(slvl),
                              config.SCORE_SEARCH_RADII[slvl],
                              normals=scene.nrm(slvl))
    occ = pp.SceneOccupancy(scene.pos(slvl),
                            config.SCORE_SEARCH_RADII[slvl],
                            scene_nrm=scene.nrm(slvl))

    p_ref, s_ref = pp.propose_poses_for_object(obj, grid, scene.bbox,
                                               occupancy=occ)
    m = pmesh.make_flat_mesh(8)
    p_sh, s_sh = pp.propose_poses_for_object(obj, grid, scene.bbox,
                                             occupancy=occ, mesh=m)
    assert len(p_ref) == len(p_sh)
    np.testing.assert_allclose(p_sh, p_ref, atol=1e-6)
    np.testing.assert_allclose(s_sh, s_ref, atol=1e-5)


def test_label_transfer_sharded_equals_single(tmp_path):
    """arrangement_to_labels with the query axis sharded over the 8-device
    mesh must write IDENTICAL labels: the gated 1-NN is per-query, so
    sharding changes no arithmetic (VERDICT r4 item 6)."""
    import numpy as np
    from rescan_tpu import config
    from rescan_tpu.core.pointcloud import PointCloud
    from rescan_tpu.io.rsdb import Placement, RsObject, Rsdb, RsScene
    from rescan_tpu.ops import labels as labels_ops
    from rescan_tpu.utils import synthetic

    spec = synthetic.SceneSpec(room_size=(1.6, 1.6), wall_height=0.9,
                               objects=[
        ("chair", (0.45, 0.45), (0.35, 0.5, 0.35), 0.0),
        ("table", (1.1, 1.1), (0.4, 0.35, 0.3), 0.2)])
    ply = str(tmp_path / "scene.ply")
    synthetic.save_scene_ply(ply, spec, resolution=6)
    scene = PointCloud.from_ply(ply)
    db = Rsdb()
    db.class_table = {n: i for i, n in enumerate(synthetic.NYU40_CLASSES)}
    arr = []
    for k, uidx in enumerate((3, 4)):
        sub = scene.extract_by_ids(0, "instance_ids", [uidx],
                                   compute_levels=True)
        db.objects.append(RsObject(uidx=uidx, filename=f"o{uidx}.ply",
                                   class_idx=5 + k, cloud=sub))
        pose = np.eye(4, dtype=np.float32)
        pose[0, 3] = 0.01 * k
        arr.append(Placement(uidx, 0, k, 0, pose, 0.9))
    db.scenes.append(RsScene(uidx=0, arrangement_idx=0, scn_filename=ply,
                             cloud=scene))

    labels_ops.arrangement_to_labels(db, scene, arr)
    L = scene.levels[config.LABEL_LVL]
    cls_ref = L["class_ids"].copy()
    ins_ref = L["instance_ids"].copy()

    labels_ops.arrangement_to_labels(db, scene, arr,
                                     mesh=pmesh.make_flat_mesh(8))
    np.testing.assert_array_equal(L["class_ids"], cls_ref)
    np.testing.assert_array_equal(L["instance_ids"], ins_ref)


@pytest.mark.slow
def test_sharding_adds_no_serialization_pathology():
    """Fixed TOTAL workload: the 8-device sharded scoring launch must not
    be SLOWER than single-device beyond dispatch noise (VERDICT r4 item 4).
    On this 1-core host the 8 virtual devices timeslice the core, so a
    speedup is impossible — the gate is a generous 1.5x bound that catches
    a serialization/collective pathology while tolerating timeslice jitter
    (tools/run_scaling.py measured 0.97x at these shapes)."""
    import time

    import jax.numpy as jnp
    import numpy as np
    from rescan_tpu.ops import hashgrid

    r = np.random.default_rng(3)
    n_scene, n_obj, H = 60_000, 512, 1024
    pts = r.uniform(0, 4, (n_scene, 3)).astype(np.float32)
    pts[:, 1] *= 0.4
    nrm = np.zeros((n_scene, 3), np.float32)
    nrm[:, 1] = 1
    grid = hashgrid.build_grid(pts, 0.1, normals=nrm)
    pts_all = jnp.asarray((pts[:n_obj]
                           + np.array([0.01, 0.004, -0.008], np.float32))[None])
    nrm_all = jnp.asarray(nrm[:n_obj][None])
    mask_all = jnp.ones((1, n_obj), bool)
    hyps = np.tile(np.eye(4, dtype=np.float32), (H, 1, 1))
    hyps[:, 0, 3] = np.linspace(-0.15, 0.15, H)
    owner = jnp.zeros(H, jnp.int32)
    h = jnp.asarray(hyps)

    walls = {}
    for n in (1, 8):
        m = pmesh.make_flat_mesh(n)

        def launch():
            return np.asarray(pmesh.score_multi_sharded(
                m, grid, pts_all, nrm_all, mask_all, h, owner, 0.1, 0.1))

        launch()  # compile
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            launch()
            best = min(best, time.perf_counter() - t0)
        walls[n] = best
    assert walls[8] <= 1.5 * walls[1] + 0.05, walls
