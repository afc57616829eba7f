"""Native SA loop (rescan_sa_run) vs the Python loop: BIT-EXACT agreement.

The Python loop is oracle-exact against the instrumented reference binary
(PARITY_r03: all 25k iterations). The native port must reproduce the Python
loop's trace exactly — same PCG32 draws, same float32/float64 promotion
points, same numpy pairwise-sum in the REPLACE pdf — so trace lines are
compared with string equality and final arrangements field-for-field.
"""

import copy
import dataclasses
import io

import numpy as np
import pytest

from rescan_tpu import config
from rescan_tpu.core.pointcloud import PointCloud
from rescan_tpu.io.rsdb import Placement, RsObject, Rsdb, RsScene
from rescan_tpu.ops import energy
from rescan_tpu.utils import synthetic


@pytest.fixture(scope="module")
def rich_db(tmp_path_factory):
    """Same construction as test_energy_fast.rich_db: 3 dynamic objects,
    several proposals each, two past arrangements."""
    tmp_path = tmp_path_factory.mktemp("sanative")
    spec = synthetic.SceneSpec(room_size=(2.2, 2.2), wall_height=0.9, objects=[
        ("chair", (0.5, 0.5), (0.35, 0.5, 0.35), 0.0),
        ("table", (1.5, 1.0), (0.5, 0.4, 0.35), 0.0),
        ("desk", (0.8, 1.7), (0.45, 0.45, 0.3), 0.4)])
    path = str(tmp_path / "scene.ply")
    synthetic.save_scene_ply(path, spec, resolution=6)
    scene = PointCloud.from_ply(path)
    db = Rsdb()
    db.class_table = {n: i for i, n in enumerate(synthetic.NYU40_CLASSES)}
    for k, inst in enumerate([3, 4, 5]):
        sub = scene.extract_by_ids(0, "instance_ids", [inst],
                                   compute_levels=True)
        db.objects.append(RsObject(uidx=inst, filename=f"o{inst}.ply",
                                   class_idx=5 + k, cloud=sub))
    for s in range(3):
        db.scenes.append(RsScene(uidx=s, arrangement_idx=s,
                                 scn_filename=path, cloud=scene))
    for lvl in range(5):
        scene.levels[lvl]["qualities"][:] = 1.0

    def T(dx, dz):
        m = np.eye(4, dtype=np.float32)
        m[0, 3], m[2, 3] = dx, dz
        return m

    poses = [np.stack([T(0, 0), T(0.3, 0.1), T(-0.2, 0.4), T(0.8, 0.8)]),
             np.stack([T(0, 0), T(0.1, -0.3), T(0.5, 0.5)]),
             np.stack([T(0, 0), T(-0.3, -0.3)])]
    scores = [np.array([0.9, 0.7, 0.6, 0.3], np.float32),
              np.array([0.8, 0.65, 0.4], np.float32),
              np.array([0.75, 0.5], np.float32)]
    past0 = [Placement(3, 0, 0, 0, T(0.05, 0.0), 0.9),
             Placement(4, 0, 1, 0, T(0.0, 0.05), 0.8)]
    past1 = [Placement(3, 0, 0, 1, T(0.25, 0.1), 0.7),
             Placement(5, 0, 1, 0, T(0.0, 0.0), 0.6),
             Placement(4, 0, 2, 0, T(-0.3, -0.3), 0.5)]
    db.arrangements = [past0, past1, []]
    db.proposed_poses = [None, None, poses]
    db.proposed_scores = [None, None, scores]
    ctx = energy.build_context(db, 2, poses, scores)
    return db, ctx, poses, scores


def _snapshot(db):
    return copy.deepcopy(db.arrangements)


def _restore(db, snap):
    db.arrangements = copy.deepcopy(snap)


def _run(db, ctx, opts, engine, monkeypatch, follow=None):
    monkeypatch.setenv("RESCAN_SA_ENGINE", engine)
    fp = io.StringIO()
    energy.simulated_annealing(ctx, db, 2, opts, trace_fp=fp, follow=follow)
    return fp.getvalue(), list(db.arrangements[2]), [
        [(p.uidx, p.object_idx) for p in arr] for arr in db.arrangements[:2]]


def _assert_same_arrangement(a, b):
    assert len(a) == len(b)
    for pa, pb in zip(a, b):
        assert pa.uidx == pb.uidx
        assert pa.arrangement_idx == pb.arrangement_idx
        assert pa.object_idx == pb.object_idx
        assert pa.pose_idx == pb.pose_idx
        assert pa.score == pb.score
        np.testing.assert_array_equal(np.asarray(pa.pose),
                                      np.asarray(pb.pose))


@pytest.mark.parametrize("init_mode", ["empty", "greedy", "offgrid"])
def test_native_sa_trace_equals_python(rich_db, monkeypatch, init_mode):
    db, ctx, poses, scores = rich_db
    snap = _snapshot(db)
    opts = config.ArrangementOpts(n_sa_iter=4000)
    try:
        if init_mode == "greedy":
            init = [Placement(3, 2, 0, 0, poses[0][0], float(scores[0][0])),
                    Placement(4, 2, 1, 1, poses[1][1], float(scores[1][1]))]
        elif init_mode == "offgrid":
            # a carried-over pose NOT in the proposal set (the 'extra' path)
            T = np.eye(4, dtype=np.float32)
            T[0, 3], T[2, 3] = 0.123, -0.077
            init = [Placement(3, 2, 0, 0, T, 0.55)]
        else:
            init = []
        db.arrangements[2] = init
        mid = _snapshot(db)

        tr_py, arr_py, past_py = _run(db, ctx, opts, "python", monkeypatch)
        _restore(db, mid)
        tr_na, arr_na, past_na = _run(db, ctx, opts, "native", monkeypatch)

        py_lines = tr_py.splitlines()
        na_lines = tr_na.splitlines()
        assert len(py_lines) == len(na_lines) == opts.n_sa_iter
        for i, (a, b) in enumerate(zip(py_lines, na_lines)):
            assert a == b, f"trace diverges at iteration {i}:\n py: {a}\n na: {b}"
        _assert_same_arrangement(arr_py, arr_na)
        assert past_py == past_na  # linearize-ids mutations replayed
        # the run must have moved: SA should have accepted something
        assert len(arr_na) > 0
    finally:
        _restore(db, snap)


def test_native_sa_replace_threshold_f32_boundary(rich_db, monkeypatch):
    """REPLACE candidate gate at dist == f32(0.35) exactly.

    0.35 is not float32-representable: the Python loop (NumPy weak-scalar)
    and the reference (arrangement_optimization.cpp:753, `< 0.35f`) compare
    in float32 and REJECT a candidate at f32(0.35) = 0.349999994; a native
    engine comparing in double would ADMIT it, changing the candidate pdf
    and the whole SA trajectory."""
    db, ctx, poses, scores = rich_db
    snap = _snapshot(db)
    try:
        # proposal at distance exactly f32(0.35) from the greedy-init pose
        boundary = np.eye(4, dtype=np.float32)
        boundary[0, 3] = np.float32(0.35)
        d = np.sqrt(np.float32(0.35) * np.float32(0.35))
        assert d == np.float32(0.35) and float(d) < 0.35  # the trap exists
        poses2 = [np.concatenate([poses[0], boundary[None]]), *poses[1:]]
        scores2 = [np.concatenate([scores[0],
                                   np.array([0.95], np.float32)]),
                   *scores[1:]]
        db.proposed_poses[2] = poses2
        db.proposed_scores[2] = scores2
        ctx2 = energy.build_context(db, 2, poses2, scores2)
        opts = config.ArrangementOpts(n_sa_iter=800)
        init = [Placement(3, 2, 0, 0, poses2[0][0], float(scores2[0][0]))]
        db.arrangements[2] = init
        mid = _snapshot(db)

        tr_py, arr_py, _ = _run(db, ctx2, opts, "python", monkeypatch)
        _restore(db, mid)
        tr_na, arr_na, _ = _run(db, ctx2, opts, "native", monkeypatch)
        for i, (a, b) in enumerate(zip(tr_py.splitlines(),
                                       tr_na.splitlines())):
            assert a == b, f"trace diverges at iteration {i}:\n py: {a}\n na: {b}"
        _assert_same_arrangement(arr_py, arr_na)
    finally:
        db.proposed_poses[2] = poses
        db.proposed_scores[2] = scores
        _restore(db, snap)


def test_native_sa_follow_mode(rich_db, monkeypatch):
    """Follow mode forces accepts from a previous trace; both engines must
    follow identically (the arrangement-parity harness depends on it)."""
    db, ctx, poses, scores = rich_db
    snap = _snapshot(db)
    opts = config.ArrangementOpts(n_sa_iter=600)
    try:
        db.arrangements[2] = []
        mid = _snapshot(db)
        tr_ref, _, _ = _run(db, ctx, opts, "python", monkeypatch)
        rows = [line.split() for line in tr_ref.splitlines()]
        # flip some decisions so follow genuinely overrides
        for r in rows[::7]:
            r[9] = "0" if r[9] == "1" else "1"

        _restore(db, mid)
        tr_py, arr_py, _ = _run(db, ctx, opts, "python", monkeypatch,
                                follow=rows)
        _restore(db, mid)
        tr_na, arr_na, _ = _run(db, ctx, opts, "native", monkeypatch,
                                follow=rows)
        assert tr_py == tr_na
        _assert_same_arrangement(arr_py, arr_na)
    finally:
        _restore(db, snap)


def test_native_sa_linearize_ids_agreement(rich_db, monkeypatch):
    """_linearize_ids fires when a past uidx sits >1 above the second
    largest; both engines must mutate the SAME past placements and stay
    trace-identical (the 4000-iter test never triggers this path)."""
    db, ctx, poses, scores = rich_db
    snap = _snapshot(db)
    opts = config.ArrangementOpts(n_sa_iter=1500)
    try:
        # a lone high uidx in the most recent past arrangement -> gap 45
        db.arrangements[1][0].uidx = 50
        mid = _snapshot(db)
        tr_py, arr_py, past_py = _run(db, ctx, opts, "python", monkeypatch)
        assert any(u not in (50,) and u > 4
                   for arr in past_py for u, _ in arr) or \
            past_py != [[(p.uidx, p.object_idx) for p in a]
                        for a in mid[:2]], "linearize never mutated the past"
        _restore(db, mid)
        tr_na, arr_na, past_na = _run(db, ctx, opts, "native", monkeypatch)
        assert tr_py == tr_na
        _assert_same_arrangement(arr_py, arr_na)
        assert past_py == past_na
        # the gap must actually have been closed by both engines
        assert all(u != 50 for arr in past_na for u, _ in arr)
    finally:
        _restore(db, snap)
