"""FastEnergy (incremental energy state) vs the reference-faithful term
functions: every mutation sequence must leave score() equal to a fresh
scene_alignment_score over the same arrangement, and the batched greedy
candidate pass must equal per-candidate full evaluations."""

import dataclasses

import numpy as np
import pytest

from rescan_tpu import config
from rescan_tpu.core.pointcloud import PointCloud
from rescan_tpu.io.rsdb import Placement, RsObject, Rsdb, RsScene
from rescan_tpu.ops import energy
from rescan_tpu.utils import synthetic


@pytest.fixture(scope="module")
def rich_db(tmp_path_factory):
    """A scene with 3 dynamic objects, multiple proposals each, and two
    past arrangements (so hysteresis/duplicate/mismatch paths all fire)."""
    tmp_path = tmp_path_factory.mktemp("energyfast")
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

    # proposals: several poses per object
    poses = [np.stack([T(0, 0), T(0.3, 0.1), T(-0.2, 0.4), T(0.8, 0.8)]),
             np.stack([T(0, 0), T(0.1, -0.3), T(0.5, 0.5)]),
             np.stack([T(0, 0), T(-0.3, -0.3)])]
    scores = [np.array([0.9, 0.7, 0.6, 0.3], np.float32),
              np.array([0.8, 0.65, 0.4], np.float32),
              np.array([0.75, 0.5], np.float32)]

    # two PAST arrangements (for hysteresis): includes a class-mismatched
    # uidx reuse and a displaced repeat
    past0 = [Placement(3, 0, 0, 0, T(0.05, 0.0), 0.9),
             Placement(4, 0, 1, 0, T(0.0, 0.05), 0.8)]
    past1 = [Placement(3, 0, 0, 1, T(0.25, 0.1), 0.7),
             Placement(5, 0, 1, 0, T(0.0, 0.0), 0.6),  # uidx 5 as class of obj1 -> mismatch vs obj2's class
             Placement(4, 0, 2, 0, T(-0.3, -0.3), 0.5)]
    db.arrangements = [past0, past1, []]
    db.proposed_poses = [None, None, poses]
    db.proposed_scores = [None, None, scores]
    ctx = energy.build_context(db, 2, poses, scores)
    return db, ctx, poses, scores


def _proposal(db, poses, scores, obj_idx, k, uidx=None):
    return Placement(uidx=db.objects[obj_idx].uidx if uidx is None else uidx,
                     arrangement_idx=2, object_idx=obj_idx, pose_idx=k,
                     pose=poses[obj_idx][k], score=float(scores[obj_idx][k]))


WEIGHTS = [config.ENERGY_WEIGHTS_SA, config.ENERGY_WEIGHTS_GREEDY,
           (1.0, 0.0, 2.0, 0.0)]


@pytest.mark.parametrize("weights", WEIGHTS)
def test_fast_energy_matches_reference_terms(rich_db, weights):
    db, ctx, poses, scores = rich_db
    n_past = 2
    state = energy.FastEnergy(ctx, db, 2, weights, n_past)
    rng = np.random.default_rng(7)

    def check():
        ref = energy.scene_alignment_score(ctx, db, state.items, weights,
                                           n_past)
        assert state.score() == pytest.approx(ref, rel=1e-9, abs=1e-12)

    check()  # empty
    # fuzz a mutation sequence
    for step in range(120):
        ops = ["add"]
        if state.items:
            ops += ["remove", "set", "set", "add"]
        if step % 17 == 0:
            ops = ["rebuild"]
        op = ops[rng.integers(len(ops))]
        if op == "add":
            oi = int(rng.integers(3))
            k = int(rng.integers(len(poses[oi])))
            uidx = int(rng.integers(3, 8))  # force duplicates sometimes
            state.add(_proposal(db, poses, scores, oi, k, uidx=uidx))
        elif op == "remove":
            state.remove_swap(int(rng.integers(len(state.items))))
        elif op == "set":
            oi = int(rng.integers(3))
            k = int(rng.integers(len(poses[oi])))
            state.set(int(rng.integers(len(state.items))),
                      _proposal(db, poses, scores, oi, k))
        elif op == "rebuild":
            keep = [dataclasses.replace(p) for p in state.items[:2]]
            state.rebuild(keep)
        check()


def test_batched_greedy_matches_per_candidate(rich_db):
    db, ctx, poses, scores = rich_db
    weights = config.ENERGY_WEIGHTS_GREEDY
    n_past = 2
    base = [_proposal(db, poses, scores, 0, 0)]
    state = energy.FastEnergy(ctx, db, 2, weights, n_past, base)

    cands = [_proposal(db, poses, scores, oi, k, uidx=u)
             for oi, k, u in [(0, 1, 3), (0, 2, 99), (1, 0, 4), (1, 1, 4),
                              (2, 0, 5), (2, 1, 3), (1, 2, 4)]]
    batched = state.score_with_each(cands)
    for j, p in enumerate(cands):
        ref = energy.scene_alignment_score(ctx, db, base + [p], weights,
                                           n_past)
        assert batched[j] == pytest.approx(ref, rel=1e-9, abs=1e-12)


def test_native_pair_penalties_matches_numpy_oracle():
    """native.pair_penalties (the SA mutators' path) vs the numpy
    _pair_penalties oracle: same formula, f64 elementwise — near-exact."""
    from rescan_tpu.core import native

    rng = np.random.default_rng(5)
    for n in (0, 1, 7, 40):
        cent = rng.standard_normal(3)
        A = rng.standard_normal((3, 3))
        sig_inv = A @ A.T
        cents = np.ascontiguousarray(rng.standard_normal((n, 3)))
        Bs = rng.standard_normal((n, 3, 3))
        sig_invs = np.ascontiguousarray(np.einsum("nij,nkj->nik", Bs, Bs))
        a = native.pair_penalties(cent, sig_inv, cents, sig_invs,
                                  config.ISECT_MAHALANOBIS_SCALE)
        b = energy.FastEnergy._pair_penalties(cent, sig_inv, cents, sig_invs)
        np.testing.assert_allclose(a, b, rtol=1e-13, atol=0)


def test_native_cov_update_matches_numpy():
    from rescan_tpu.core import native

    rng = np.random.default_rng(6)
    cnt = rng.integers(0, 3, 500).astype(np.int32)
    old = np.unique(rng.integers(0, 500, 80))
    new = np.unique(rng.integers(0, 500, 90))
    ref = cnt.copy()
    ref[old] -= 1
    d = -int((ref[old] == 0).sum())
    d += int((ref[new] == 0).sum())
    ref[new] += 1
    got = native.cov_update(cnt, old, new)
    assert got == d
    np.testing.assert_array_equal(cnt, ref)


def test_past_invalidation(rich_db):
    """Mutating a past arrangement's uidx (what _linearize_ids does) must
    change hysteresis after invalidate_past()."""
    db, ctx, poses, scores = rich_db
    weights = (0.0, 0.0, 0.0, 1.0)
    state = energy.FastEnergy(ctx, db, 2, weights, 2,
                              [_proposal(db, poses, scores, 0, 0)])
    s_before = state.score()
    # retire uidx 3 from EVERY past arrangement: the placement flips from
    # existed (bonus 0.4, clipped at 1.0) to novel (score 0 + bonus 0.375)
    saved = [(ai, j, p.uidx) for ai, arr in enumerate(db.arrangements[:2])
             for j, p in enumerate(arr) if p.uidx == 3]
    for ai, j, _ in saved:
        db.arrangements[ai][j].uidx = 999
    state.invalidate_past()
    s_after = state.score()
    ref = energy.scene_alignment_score(ctx, db, state.items, weights, 2)
    assert s_after == pytest.approx(ref, rel=1e-9)
    assert s_after != pytest.approx(s_before, abs=1e-12)
    for ai, j, u in saved:
        db.arrangements[ai][j].uidx = u
    state.invalidate_past()
    assert state.score() == pytest.approx(s_before, rel=1e-9)
