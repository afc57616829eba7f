"""Arrangement optimization: the 4-term scene-alignment energy, greedy
construction, and simulated annealing.

Mirrors apps/segment_transfer/arrangement_optimization.cpp. The TPU-native
restructuring: every candidate placement's voxel coverage footprint is
precomputed ONCE as a unique-cell array (the reference re-rasterizes the
whole arrangement into a dense grid for every single energy evaluation,
:344-373 + :1082-1106); coverage is then maintained incrementally with
per-cell counts, making each greedy round one vectorized pass over all
proposals and each SA step O(changed cells).

Energy terms (weights normalized by their sum, :376-402):
  scncov — fraction of salient scene voxels covered by the arrangement
           (:344-373)
  geom   — mean placement score (:312-342)
  isect  — 1 - max pairwise Mahalanobis-at-midpoint penalty, scale 0.39
           (:238-310; the error_count branch is compiled out so the mean
           path never runs)
  hyster — temporal persistence vs the last n_past_steps arrangements with
           volume-dependent sigma, decayed by recency, +0.4/+0.375
           existed/novel bonus, -0.25 class mismatch, -5 per duplicate
           uidx, clamped >= 0 (:84-236)

SA (:789-935): 25k iterations, actions add/remove/replace/swap/move with
likelihoods {.01,.01,.01,1,.5}, temperature 0.01 -> 1e-4 linear, random
restart p=0.01, acceptance exp(-(prev-cur)/T), PCG seed 12346 (exact msh
PRNG replica). uidx linearization after every step (:434-465).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .. import config
from ..io.rsdb import Placement, Rsdb
from ..utils import rng as mshrng


# ---------------------------------------------------------------------------
# Coverage grid context
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class EnergyContext:
    """Precomputed scene/proposal data shared by greedy and SA."""
    origin: np.ndarray            # fattened scene-bbox min (0.05 grid)
    res: np.ndarray               # (3,) int cells
    voxel: float
    scn_valid: np.ndarray         # bool (n_cells,) salient scene cells
    n_scn_valid: int
    # cells[obj_idx][pose_idx] -> unique int32 cell ids of the proposal
    proposal_cells: List[List[np.ndarray]]
    # per (obj, pose): world centroid + inverse of rotated covariance
    proposal_centroid: List[np.ndarray]     # per obj: (K, 3)
    proposal_sigma_inv: List[np.ndarray]    # per obj: (K, 3, 3)
    obj_volume: np.ndarray        # (n_objects,) bbox volume of each object
    obj_class: np.ndarray         # (n_objects,)
    obj_static: np.ndarray        # (n_objects,) bool
    obj_cells_cache: Dict[Tuple[int, int], np.ndarray] = dataclasses.field(
        default_factory=dict)
    gauss_cache: Dict[Tuple[int, int], Tuple[np.ndarray, np.ndarray]] = \
        dataclasses.field(default_factory=dict)
    # scratch for O(changed cells) coverage evaluation
    _stamp: Optional[np.ndarray] = None
    _gen: int = 0

    def world_to_cells(self, pts: np.ndarray, pose: np.ndarray) -> np.ndarray:
        """Unique in-range cell ids of posed points (world_to_cell arithmetic
        of isect_grid3d_cell_from_world_space, intersect.h:96-109)."""
        p = pts @ pose[:3, :3].T + pose[:3, 3]
        c = np.floor((p - self.origin) * np.float32(1.0 / self.voxel)).astype(np.int64)
        ok = ((c >= 0) & (c < self.res[None, :])).all(axis=1)
        c = c[ok]
        flat = (c[:, 1] * self.res[2] + c[:, 2]) * self.res[0] + c[:, 0]
        return np.unique(flat).astype(np.int64)


def build_context(db: Rsdb, scene_idx: int,
                  poses: List[Optional[np.ndarray]],
                  scores: List[Optional[np.ndarray]]) -> EnergyContext:
    scene = db.scenes[scene_idx].cloud
    bmin, bmax = scene.bbox
    fat = config.ISECT_FAT_FACTOR
    origin = (bmin - fat).astype(np.float32)
    res = (np.ceil(((bmax + fat) - origin) /
                   np.float32(config.ENERGY_GRID_VOXEL)).astype(np.int64) + 1)
    n_cells = int(res.prod())

    ctx = EnergyContext(
        origin=origin, res=res, voxel=config.ENERGY_GRID_VOXEL,
        scn_valid=np.zeros(n_cells, bool), n_scn_valid=0,
        proposal_cells=[], proposal_centroid=[], proposal_sigma_inv=[],
        obj_volume=np.zeros(len(db.objects), np.float64),
        obj_class=np.array([o.class_idx for o in db.objects], np.int64),
        obj_static=np.array([db.is_object_static(i)
                             for i in range(len(db.objects))], bool))

    # scene occupancy from level-2 salient points (rsao_rasterize_scene_to_grid,
    # arrangement_optimization.cpp:1064-1079)
    lvl = config.SCENE_RASTERIZE_LVL
    q = scene.levels[lvl]["qualities"]
    cells = ctx.world_to_cells(scene.pos(lvl)[q >= config.SCENE_RASTERIZE_QUALITY_THRESHOLD],
                               np.eye(4, dtype=np.float32))
    ctx.scn_valid[cells] = True
    ctx.n_scn_valid = int(ctx.scn_valid.sum())

    for i, obj in enumerate(db.objects):
        bminO = obj.cloud.pos(0).min(axis=0)
        bmaxO = obj.cloud.pos(0).max(axis=0)
        ctx.obj_volume[i] = float(np.prod(bmaxO - bminO))
        k = 0 if poses[i] is None else len(poses[i])
        cell_list, cents, sig_invs = [], [], []
        if k and not ctx.obj_static[i]:
            pts2 = obj.cloud.pos(config.ARRANGEMENT_RASTERIZE_LVL)
            c0 = obj.cloud.centroid(0)
            cov = obj.cloud.covariance(0).astype(np.float64)
            for p in range(k):
                T = np.asarray(poses[i][p], np.float32)
                key = (i, hash(T.tobytes()))
                cells = ctx.world_to_cells(pts2, T)
                cell_list.append(cells)
                ctx.obj_cells_cache[key] = cells
                R = T[:3, :3].astype(np.float64)
                cent = R @ c0 + T[:3, 3]
                sig_inv = np.linalg.pinv(R @ cov @ R.T)
                cents.append(cent)
                sig_invs.append(sig_inv)
                ctx.gauss_cache[key] = (cent, sig_inv)
        ctx.proposal_cells.append(cell_list)
        ctx.proposal_centroid.append(np.asarray(cents).reshape(-1, 3))
        ctx.proposal_sigma_inv.append(np.asarray(sig_invs).reshape(-1, 3, 3))
    ctx._stamp = np.zeros(n_cells, np.int64)
    return ctx


def placement_cells(ctx: EnergyContext, db: Rsdb, p: Placement) -> np.ndarray:
    """Covered cells of a placement; proposals hit the precomputed table,
    anything else (e.g. carried-over poses) is rasterized once and cached."""
    i = p.object_idx
    key = (i, hash(np.asarray(p.pose, np.float32).tobytes()))
    cached = ctx.obj_cells_cache.get(key)
    if cached is not None:
        return cached
    cells = ctx.world_to_cells(
        db.objects[i].cloud.pos(config.ARRANGEMENT_RASTERIZE_LVL), p.pose)
    ctx.obj_cells_cache[key] = cells
    return cells


def placement_gaussian(ctx: EnergyContext, db: Rsdb, p: Placement):
    """(world centroid, inverse rotated covariance) of a placement, cached."""
    key = (p.object_idx, hash(p.pose.tobytes()))
    g = ctx.gauss_cache.get(key)
    if g is None:
        obj = db.objects[p.object_idx].cloud
        R = p.pose[:3, :3].astype(np.float64)
        cent = R @ obj.centroid(0) + p.pose[:3, 3]
        sig = R @ obj.covariance(0).astype(np.float64) @ R.T
        g = (cent, np.linalg.pinv(sig))
        ctx.gauss_cache[key] = g
    return g


# ---------------------------------------------------------------------------
# Energy terms
# ---------------------------------------------------------------------------

def coverage_score(ctx: EnergyContext, db: Rsdb,
                   arrangement: Sequence[Placement]) -> float:
    """rsao__compute_scene_coverage_score (:344-373): fraction of salient
    scene cells covered by dynamic placements."""
    if ctx.n_scn_valid == 0:
        return 0.0
    # generation-stamp scratch: O(sum of placement cells) per evaluation
    ctx._gen += 1
    gen = ctx._gen
    agree = 0
    for p in arrangement:
        if ctx.obj_static[p.object_idx]:
            continue
        cells = placement_cells(ctx, db, p)
        fresh = cells[ctx._stamp[cells] != gen]
        ctx._stamp[fresh] = gen
        agree += int(ctx.scn_valid[fresh].sum())
    return agree / ctx.n_scn_valid


def geometry_score(arrangement: Sequence[Placement]) -> float:
    """rsao__compute_geometry_score (:312-342): mean placement score."""
    if not arrangement:
        return 0.0
    return float(np.mean([p.score for p in arrangement]))


def _mahalanobis_val(p, mu, sig_inv, scale=config.ISECT_MAHALANOBIS_SCALE):
    d = p - mu
    m = np.sqrt(max(float(d @ sig_inv @ d), 0.0))
    return np.exp(-(1.0 / (2 * scale * scale)) * m)


def intersection_score(ctx: EnergyContext, db: Rsdb,
                       arrangement: Sequence[Placement]) -> float:
    """rsao__compute_intersection_score (:238-310): 1 - max over placements
    of the max pairwise midpoint Mahalanobis penalty."""
    n = len(arrangement)
    if n == 0:
        return 1.0
    cents, sig_invs = [], []
    for p in arrangement:
        cent, sig_inv = placement_gaussian(ctx, db, p)
        cents.append(cent)
        sig_invs.append(sig_inv)
    error = 0.0
    for a in range(n):
        cur = 0.0
        for b in range(n):
            if a == b:
                continue
            mid = 0.5 * (cents[a] + cents[b])
            ea = _mahalanobis_val(mid, cents[a], sig_invs[a])
            eb = _mahalanobis_val(mid, cents[b], sig_invs[b])
            cur = max(cur, 0.5 * (ea + eb))
        error = max(error, cur)
    return 1.0 - error


def hysteresis_score(db: Rsdb, arrangement: Sequence[Placement],
                     n_past_steps: int) -> float:
    """rsao__compute_hysteresis_score (:116-236)."""
    n = len(arrangement)
    if n == 0:
        return 0.0
    n_arr = len(db.arrangements)
    scores = np.zeros(n)
    existed = np.zeros(n, bool)
    mismatched = np.zeros(n, bool)
    for past_idx in range(1, n_past_steps + 1):
        ai = n_arr - (past_idx + 1)
        if ai < 0:
            continue
        past = db.arrangements[ai]
        decay = config.HYSTER_DECAY_A * past_idx + config.HYSTER_DECAY_B
        for ci, cur in enumerate(arrangement):
            cur_cls = db.objects[cur.object_idx].class_idx
            vol = _bbox_volume(db.objects[cur.object_idx].cloud)
            sigma = max(config.HYSTER_SIGMA_A * np.exp(-config.HYSTER_SIGMA_B * vol)
                        + config.HYSTER_SIGMA_C, config.HYSTER_SIGMA_MIN)
            for po in past:
                po_cls = db.objects[po.object_idx].class_idx
                if po.uidx == cur.uidx and cur_cls == po_cls:
                    existed[ci] = True
                    d2 = float(np.sum((cur.pose[:3, 3] - po.pose[:3, 3]) ** 2))
                    s = np.exp(-d2 / (2 * sigma * sigma)) * config.HYSTER_BASE_SCALE
                    s *= decay
                    if s > scores[ci]:
                        scores[ci] = s
                if po.uidx == cur.uidx and cur_cls != po_cls:
                    mismatched[ci] = True
    scores[mismatched] = config.HYSTER_MISMATCH_PENALTY
    scores = scores + np.where(existed, config.HYSTER_EXISTED_BONUS,
                               config.HYSTER_NOVEL_BONUS)
    scores = np.minimum(scores, 1.0)
    uids = [p.uidx for p in arrangement]
    n_dup = sum(1 for i in range(n - 1) for j in range(i + 1, n)
                if uids[i] == uids[j])
    total = scores.sum() / n - n_dup * config.HYSTER_DUPLICATE_PENALTY
    return max(float(total), 0.0)


def _bbox_volume(cloud) -> float:
    bmin, bmax = cloud.bbox
    return float(np.prod(bmax - bmin))


def scene_alignment_score(ctx: EnergyContext, db: Rsdb,
                          arrangement: Sequence[Placement],
                          weights: Sequence[float],
                          n_past_steps: int) -> float:
    """rsao_compute_scene_alignment_score (:376-402)."""
    w_cov, w_geom, w_isect, w_hyst = weights
    s = 0.0
    if w_geom > 0:
        s += w_geom * geometry_score(arrangement)
    if w_isect > 0:
        s += w_isect * intersection_score(ctx, db, arrangement)
    if w_hyst > 0:
        s += w_hyst * hysteresis_score(db, arrangement, n_past_steps)
    if w_cov > 0:
        s += w_cov * coverage_score(ctx, db, arrangement)
    return s / sum(weights)


# ---------------------------------------------------------------------------
# Greedy construction (rsao_greedy_step, :937-1035)
# ---------------------------------------------------------------------------

def greedy_step(ctx: EnergyContext, db: Rsdb, scene_idx: int,
                opts: config.ArrangementOpts) -> float:
    poses = db.proposed_poses[scene_idx]
    scores = db.proposed_scores[scene_idx]
    arrangement = db.arrangements[scene_idx]
    weights = opts.energy_weights_greedy

    max_uidx = db.max_dynamic_uidx()
    used = {p.uidx for p in arrangement}

    proposals: List[Placement] = []
    for obj_idx in range(len(poses)):
        if ctx.obj_static[obj_idx] or poses[obj_idx] is None:
            continue
        uidx = db.objects[obj_idx].uidx
        for k in range(len(poses[obj_idx])):
            proposals.append(Placement(
                uidx=uidx, arrangement_idx=scene_idx, object_idx=obj_idx,
                pose_idx=k, pose=poses[obj_idx][k],
                score=float(scores[obj_idx][k])))
    if not proposals:
        return scene_alignment_score(ctx, db, arrangement, weights,
                                     opts.n_past_steps)
    # duplicate-uidx remap (greedy :996-1006)
    for p in proposals:
        if p.uidx in used:
            p.uidx = max_uidx + 1

    best_score, best_idx = 0.0, -1
    for i, p in enumerate(proposals):
        cand = list(arrangement) + [p]
        s = scene_alignment_score(ctx, db, cand, weights, opts.n_past_steps)
        if s - best_score > 1e-6:
            best_score, best_idx = s, i
    arrangement.append(proposals[best_idx])
    return scene_alignment_score(ctx, db, arrangement, weights,
                                 opts.n_past_steps)


def greedy_optimize(ctx: EnergyContext, db: Rsdb, scene_idx: int,
                    opts: config.ArrangementOpts) -> None:
    """The greedy driver loop (apps/segment_transfer/main.cpp:344-364):
    keep adding the single best proposal until the score stops improving
    (pop the last placement if it made things worse)."""
    weights = opts.energy_weights_greedy
    score = scene_alignment_score(ctx, db, db.arrangements[scene_idx],
                                  weights, opts.n_past_steps)
    while True:
        prev = score
        score = greedy_step(ctx, db, scene_idx, opts)
        if prev - score > 1e-6:
            db.arrangements[scene_idx].pop()
            break
        if abs(prev - score) < 1e-6:
            break


# ---------------------------------------------------------------------------
# Simulated annealing (rsao_simulated_annealing, :789-935)
# ---------------------------------------------------------------------------

def _find_max_uidx(db: Rsdb) -> Tuple[int, int, int]:
    max_uidx, si, pi = 0, -1, -1
    for s, arr in enumerate(db.arrangements):
        for j, p in enumerate(arr):
            if not db.is_object_static(p.object_idx) and p.uidx > max_uidx:
                max_uidx, si, pi = p.uidx, s, j
    return max_uidx, si, pi


def _linearize_ids(db: Rsdb) -> None:
    """rsao__linearize_ids (:434-465): keep the global max dynamic uidx at
    most 1 above the second largest."""
    max_uidx, si, pi = _find_max_uidx(db)
    second = 0
    for arr in db.arrangements:
        for p in arr:
            if (not db.is_object_static(p.object_idx)
                    and second < p.uidx < max_uidx):
                second = p.uidx
    if max_uidx - second > 1 and si >= 0:
        db.arrangements[si][pi].uidx = second + 1


def simulated_annealing(ctx: EnergyContext, db: Rsdb, scene_idx: int,
                        opts: config.ArrangementOpts) -> None:
    rand = mshrng.MshRand(config.SA_SEED)
    poses = db.proposed_poses[scene_idx]
    pscores = db.proposed_scores[scene_idx]
    weights = opts.energy_weights_sa
    cur = [dataclasses.replace(p) for p in db.arrangements[scene_idx]]

    likelihoods = np.asarray(opts.sa_action_likelihoods, np.float64)
    if likelihoods[0] < 0.001 and len(cur) < 2:
        return

    def energy(arr):
        return scene_alignment_score(ctx, db, arr, weights, opts.n_past_steps)

    init_score = energy(cur)
    prev_score = init_score
    max_score = init_score

    def commit():
        db.arrangements[scene_idx] = [dataclasses.replace(p) for p in cur]

    dynamic_ids = [i for i in range(len(db.objects))
                   if not ctx.obj_static[i]]

    for it in range(opts.n_sa_iter):
        # random restart (:821-829)
        if rand.next_f32() < config.SA_RESTART_PROB:
            cur = [dataclasses.replace(p) for p in db.arrangements[scene_idx]]

        # action selection (:832-841)
        lk = likelihoods.copy()
        if len(cur) < 2:
            lk[3] = 0.0  # swap
        pdf = mshrng.distrib2pdf(lk)
        action = mshrng.pdfsample_linear(pdf, rand.next_f32())

        undo = None
        if action == 0:      # ADD (:628-705)
            undo = _apply_add(db, ctx, scene_idx, rand, cur, poses, pscores)
        elif action == 1:    # REMOVE (:707-727)
            undo = _apply_remove(rand, cur)
        elif action == 2:    # REPLACE (:729-787)
            undo = _apply_replace(db, ctx, scene_idx, rand, cur, poses, pscores)
        elif action == 3:    # SWAP (:527-626)
            undo = _apply_swap(rand, cur, poses, pscores)
        elif action == 4:    # MOVE (:494-525)
            undo = _apply_move(rand, cur, poses, pscores)

        cur_score = energy(cur)
        if cur_score < 0:
            commit()
            break
        temp = max(config.SA_INIT_TEMP * (1.0 - it / opts.n_sa_iter),
                   config.SA_MIN_TEMP)
        accept_p = (1.0 if cur_score > prev_score
                    else np.exp(-(prev_score - cur_score) / temp))
        roll = rand.next_f32()
        if accept_p >= roll:
            prev_score = cur_score
            if cur_score > max_score:
                max_score = cur_score
                commit()
        else:
            if undo is not None:
                undo()
        _linearize_ids(db)

    print(f"SIMULATED_ANNEALING: Done. | Score: {init_score:f} -> {max_score:f}")


def _apply_move(rand, cur, poses, pscores):
    n = len(cur)
    if n == 0:
        return None
    idx = rand.next_u32() % n
    old = dataclasses.replace(cur[idx])
    obj_idx = cur[idx].object_idx
    if poses[obj_idx] is None or len(poses[obj_idx]) == 0:
        return None
    k = rand.next_u32() % len(poses[obj_idx])
    cur[idx] = dataclasses.replace(cur[idx], pose=poses[obj_idx][k],
                                   score=float(pscores[obj_idx][k]),
                                   pose_idx=k)

    def undo():
        cur[idx] = old
    return undo


def _apply_swap(rand, cur, poses, pscores):
    """Swap: re-draw poses for two placements, each near the other's
    position (:527-626)."""
    n = len(cur)
    ia = rand.next_u32() % n
    ib = ia
    while ib == ia:
        ib = rand.next_u32() % n
    a, b = cur[ia], cur[ib]
    olds = (dataclasses.replace(a), dataclasses.replace(b))

    def pick_near(obj_idx, target_pos):
        cand = poses[obj_idx]
        if cand is None or len(cand) == 0:
            return None
        d = np.linalg.norm(cand[:, :3, 3] - target_pos[None, :], axis=1)
        thr = config.SWAP_DIST_THRESHOLD
        if thr < d.min():
            thr = 2.0 * d.min()
        idxs = np.where(d < thr)[0]
        if len(idxs) == 0:
            return None
        return int(idxs[rand.next_u32() % len(idxs)])

    ka = pick_near(a.object_idx, b.pose[:3, 3])
    kb = pick_near(b.object_idx, a.pose[:3, 3])
    if ka is not None:
        cur[ia] = dataclasses.replace(a, pose=poses[a.object_idx][ka],
                                      score=float(pscores[a.object_idx][ka]),
                                      pose_idx=ka)
    if kb is not None:
        cur[ib] = dataclasses.replace(b, pose=poses[b.object_idx][kb],
                                      score=float(pscores[b.object_idx][kb]),
                                      pose_idx=kb)

    def undo():
        cur[ia], cur[ib] = olds
    return undo


def _apply_add(db, ctx, scene_idx, rand, cur, poses, pscores):
    """Add: uniform dynamic object, pose by normalized-score pdf
    (:628-705)."""
    max_uidx, _, _ = _find_max_uidx(db)
    used = {p.uidx for p in db.arrangements[scene_idx]}

    lik = np.array([0.0 if ctx.obj_static[i] else 1.0
                    for i in range(len(db.objects))])
    pdf = mshrng.distrib2pdf(lik)
    obj_idx = mshrng.pdfsample_linear(pdf, rand.next_f32())
    if obj_idx >= len(db.objects) or poses[obj_idx] is None or len(poses[obj_idx]) == 0:
        return None
    sc = np.asarray(pscores[obj_idx], np.float64)
    mx, mn = max(sc.max(), 0.0), min(sc.min(), 1.0)
    rangev = mx - mn
    norm = (sc - mn) / rangev if rangev > 0 else np.zeros_like(sc)
    pdf = mshrng.distrib2pdf(norm)
    k = mshrng.pdfsample_linear(pdf, rand.next_f32())
    k = min(k, len(sc) - 1)
    uidx = db.objects[obj_idx].uidx
    if uidx in used:
        uidx = max_uidx + 1
    cur.append(Placement(uidx=uidx, arrangement_idx=scene_idx,
                         object_idx=obj_idx, pose_idx=k,
                         pose=poses[obj_idx][k],
                         score=float(pscores[obj_idx][k])))

    def undo():
        cur.pop()
    return undo


def _apply_remove(rand, cur):
    """Remove: swap-remove a random placement (:707-727). The reference's
    revert reads one-past-end of the shrunk array, which in practice
    restores the removed element (it still sits in the buffer slot); we
    implement the intended swap-remove + restore."""
    n = len(cur)
    if n == 0:
        return None
    idx = rand.next_u32() % n
    removed = cur[idx]
    cur[idx] = cur[n - 1]
    cur.pop()

    def undo():
        # invert the swap-remove: push the (moved) last element back to the
        # tail and restore the removed one at its slot
        if idx == len(cur):          # removed element WAS the last one
            cur.append(removed)
        else:
            cur.append(cur[idx])
            cur[idx] = removed
    return undo


def _apply_replace(db, ctx, scene_idx, rand, cur, poses, pscores):
    """Replace: swap a placement for a score-weighted nearby proposal of
    any dynamic object (:729-787)."""
    n = len(cur)
    if n == 0:
        return None
    idx = rand.next_u32() % n
    old = dataclasses.replace(cur[idx])
    old_pos = old.pose[:3, 3]
    cand = []
    for i in range(len(db.objects)):
        if ctx.obj_static[i] or poses[i] is None:
            continue
        for k in range(len(poses[i])):
            if np.linalg.norm(poses[i][k][:3, 3] - old_pos) < config.REPLACE_DIST_THRESHOLD:
                cand.append((i, k, float(pscores[i][k])))
            if len(cand) >= 1024:
                break
    if not cand:
        return None
    sc = np.array([c[2] for c in cand], np.float64)
    pdf = mshrng.distrib2pdf(sc)
    sel = mshrng.pdfsample_linear(pdf, rand.next_f32())
    sel = min(sel, len(cand) - 1)
    i, k, s = cand[sel]
    cur[idx] = Placement(uidx=db.objects[i].uidx,
                         arrangement_idx=len(db.arrangements),
                         object_idx=i, pose_idx=k, pose=poses[i][k], score=s)

    def undo():
        cur[idx] = old
    return undo
