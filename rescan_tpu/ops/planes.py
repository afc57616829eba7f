"""RANSAC floor/wall detection, connected-component splitting, plane
classification and wall/floor relabeling.

Mirrors lib/rs/rs_pointcloud_filters.cpp:80-671. RANSAC hypothesis sampling
uses the exact msh PRNG replica (seed 12346) so the candidate stream matches
the reference; inlier evaluation is vectorized over all candidates at once
instead of one hypothesis per loop iteration.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

from .. import config
from ..utils import rng as mshrng
from ..core import native


@dataclasses.dataclass
class PlaneModel:
    """rspf_plane_model_t (lib/rs/rs_pointcloud_filters.h:22-31)."""
    center: np.ndarray
    normal: np.ndarray
    n_inliers: int = 0
    inlier_ind: Optional[np.ndarray] = None
    axes: Optional[np.ndarray] = None       # (3,3) columns
    extends: Optional[np.ndarray] = None    # (max_x, max_y, min_x, min_y)
    valid: bool = False
    # features (rspf_plane_feature_set_t)
    count: int = 0
    max_y: float = 0.0
    normal_up_dot: float = 0.0
    saliency: float = 0.0


class PlaneCountsEngine:
    """Native RANSAC inlier counting for one point set.

    Counting is a bandwidth-bound scan of the host-resident points —
    exactly the workload the reference OpenMP-parallelizes
    (rs_pointcloud_filters.cpp:162-176) — so it runs in the native host
    library (core/native.plane_counts, OpenMP over candidates). Device
    matmul variants measured ~3 s/round through the remote TPU tunnel vs
    ~0.1 s here; the numpy broadcast was ~1.5 s/round on this host."""

    def __init__(self, pts: np.ndarray):
        self.pts = np.ascontiguousarray(pts, np.float32)
        self.n = len(pts)

    def counts(self, anchors: np.ndarray, normals: np.ndarray,
               valid: np.ndarray, active: np.ndarray, dist: float
               ) -> np.ndarray:
        """active: (n,) bool — the points still in play this round."""
        n32 = np.where(valid[:, None], normals, 0.0).astype(np.float32)
        off = np.einsum("ci,ci->c", n32.astype(np.float64),
                        anchors.astype(np.float64)).astype(np.float32)
        counts = native.plane_counts(self.pts, active, n32, off, dist)
        counts[~valid] = 0
        return counts


def detect_floor(pts: np.ndarray, nrm: np.ndarray,
                 engine: "PlaneCountsEngine | None" = None
                 ) -> List[PlaneModel]:
    """rspf__detect_floor (rs_pointcloud_filters.cpp:204-252): 2500 RANSAC
    rounds over up-facing points, keep the best plane."""
    up_dot = nrm[:, 1]
    weights = (up_dot > config.PLANE_DOT_THRESHOLD).astype(np.float64)
    if weights.sum() == 0:
        return []
    engine = engine or PlaneCountsEngine(pts)
    dist = mshrng.MshDiscreteDistribution(weights, config.PLANE_RANSAC_SEED)
    n_iter = config.PLANE_FLOOR_RANSAC_ITER
    # native sampler: same alias tables, same PCG32 stream (a Python-loop
    # draw costs ~5 us on this host; 3 draws x 2500..5000 rounds add up)
    tri = native.ransac_triplets(dist.prob, dist.alias,
                                 config.PLANE_RANSAC_SEED, n_iter,
                                 reject_equal=False)
    pa, pb, pc_ = pts[tri[:, 0]], pts[tri[:, 1]], pts[tri[:, 2]]
    n = np.cross(pb - pa, pc_ - pa)
    with np.errstate(invalid="ignore", divide="ignore"):
        n = n / np.linalg.norm(n, axis=1, keepdims=True)
    valid = np.isfinite(n).all(axis=1)
    counts = engine.counts(pa, n, valid, weights > 0.01,
                           config.PLANE_DIST_THRESHOLD)
    best = int(np.argmax(counts))
    if counts[best] == 0:
        return []
    return [PlaneModel(center=pa[best].copy(), normal=n[best].copy(),
                       n_inliers=int(counts[best]))]


def detect_walls(pts: np.ndarray, nrm: np.ndarray,
                 engine: "PlaneCountsEngine | None" = None
                 ) -> List[PlaneModel]:
    """rspf__detect_walls (rs_pointcloud_filters.cpp:136-202): repeated
    5000-round RANSAC over vertical-normal points with inlier removal,
    until the best round finds < 250 inliers (that last model is dropped)."""
    up_dot = np.abs(nrm[:, 1])
    weights = (up_dot < (1.0 - config.PLANE_DOT_THRESHOLD)).astype(np.float64)
    engine = engine or PlaneCountsEngine(pts)
    models: List[PlaneModel] = []
    while True:
        if weights.sum() == 0:
            break
        dist = mshrng.MshDiscreteDistribution(weights, config.PLANE_RANSAC_SEED)
        n_iter = config.PLANE_WALL_RANSAC_ITER
        tri = native.ransac_triplets(dist.prob, dist.alias,
                                     config.PLANE_RANSAC_SEED, n_iter,
                                     reject_equal=True)
        pa, pb, pc_ = pts[tri[:, 0]], pts[tri[:, 1]], pts[tri[:, 2]]
        n = np.cross(pb - pa, pc_ - pa)
        with np.errstate(invalid="ignore", divide="ignore"):
            n = n / np.linalg.norm(n, axis=1, keepdims=True)
        vertical = np.abs(n[:, 1]) < (1.0 - config.PLANE_DOT_THRESHOLD)
        valid = vertical & np.isfinite(n).all(axis=1)
        counts = engine.counts(pa, n, valid, weights > 0.01,
                               config.PLANE_DIST_THRESHOLD)
        best = int(np.argmax(counts))
        best_count = int(counts[best])
        detected = best_count > 0
        model = PlaneModel(center=pa[best].copy(), normal=n[best].copy(),
                           n_inliers=best_count)
        if detected:
            models.append(model)
        # remove inliers of the best model from the weight mask (:192-193)
        if detected:
            act = weights > 0.01
            d = np.abs((pts - model.center) @ model.normal)
            weights[act & (d < config.PLANE_DIST_THRESHOLD)] = 0.0
        if best_count <= config.PLANE_WALL_COUNT_THRESHOLD:
            break
    # the do/while pops the final (below-threshold) model (:197)
    if models:
        models.pop()
    return models


def gather_inliers(models: List[PlaneModel], pts: np.ndarray, nrm: np.ndarray,
                   dot_threshold: float, dist_threshold: float,
                   check_validity: bool = False,
                   check_extends: bool = False) -> None:
    """rspf__gather_model_inliers (rs_pointcloud_filters.cpp:277-323):
    points with |dot(n_i, plane_n)| > dot AND plane-distance < dist;
    optionally restricted to the plane's extent rectangle. All models'
    distance/dot tests run as two (n_pts, n_models) GEMMs."""
    active = [m for m in models
              if not (check_validity and not m.valid)]
    if not active:
        return
    N = np.stack([m.normal for m in active]).astype(np.float32)   # (M, 3)
    C = np.stack([m.center for m in active]).astype(np.float32)
    sel = native.plane_gather(pts, nrm, C, N, dot_threshold, dist_threshold)
    for k, m in enumerate(active):
        idx = np.flatnonzero(sel[k])
        if check_extends and len(idx):
            poly = _extent_polygon(m)
            keep = _points_in_convex_poly(pts[idx], poly)
            idx = idx[keep]
        m.inlier_ind = idx
        m.n_inliers = len(idx)


def _extent_polygon(m: PlaneModel) -> np.ndarray:
    o = m.center
    px = m.axes[:, 0] * m.extends[0]
    py = m.axes[:, 1] * m.extends[1]
    nx = m.axes[:, 0] * m.extends[2]
    ny = m.axes[:, 1] * m.extends[3]
    return np.stack([o + px + py, o + px + ny, o + nx + ny, o + nx + py])


def _points_in_convex_poly(p: np.ndarray, poly: np.ndarray) -> np.ndarray:
    """rspf__is_point_within_convex_poly (rs_pointcloud_filters.cpp:254-275):
    consistent cross-product side test over consecutive edges."""
    ok = np.ones(len(p), dtype=bool)
    nv = len(poly)
    for i in range(nv - 1):
        a, b, c = poly[i], poly[i + 1], poly[(i + 2) % nv]
        v1 = b - a
        n1 = np.cross(v1, c - b)
        n2 = np.cross(v1[None, :], p - b)
        ok &= (n2 @ n1) >= 0
    return ok


def _components_min_label(n: int, src: np.ndarray, dst: np.ndarray
                          ) -> np.ndarray:
    """Connected components of an undirected edge list (native union-find
    with path halving, core/native.union_find — identical memberships to
    the reference's per-edge union-find, rs_pointcloud_filters.cpp:30-66).
    Returns (n,) component root labels."""
    return native.union_find(n, src, dst).astype(np.int64)


def split_connected_components(models: List[PlaneModel], pts: np.ndarray
                               ) -> List[PlaneModel]:
    """rspf__split_by_connected_components (rs_pointcloud_filters.cpp:325-436):
    components of an 8-NN 0.05-radius graph of each model's inliers;
    emit one model per component, in first-occurrence order."""
    out: List[PlaneModel] = []
    for m in models:
        if m.inlier_ind is None or len(m.inlier_ind) == 0:
            continue
        cur = pts[m.inlier_ind]
        grid = native.HostGrid(cur, config.PLANE_CC_RADIUS)
        idx, _, cnt = grid.radius_search(cur, config.PLANE_CC_RADIUS,
                                         config.PLANE_CC_MAX_NN)
        n, k = idx.shape
        # the reference skips each query's first neighbor (itself, j from 1)
        col = np.arange(k)[None, :]
        valid = (col >= 1) & (col < cnt[:, None]) & (idx >= 0)
        src = np.broadcast_to(np.arange(n, dtype=np.int64)[:, None],
                              (n, k))[valid]
        dst = idx[valid].astype(np.int64)
        roots = _components_min_label(n, src, dst)
        _, first = np.unique(roots, return_index=True)
        for r in roots[np.sort(first)]:
            sel = roots == r
            nm = PlaneModel(center=m.center.copy(), normal=m.normal.copy(),
                            n_inliers=int(sel.sum()),
                            inlier_ind=m.inlier_ind[sel])
            out.append(nm)
    return out


def segment_graph(n_vertices: int, edges: np.ndarray, weights: np.ndarray,
                  c: float) -> np.ndarray:
    """Felzenszwalb-Huttenlocher graph segmentation
    (rspf__segment_graph, rs_pointcloud_filters.cpp:991-1014; unused by the
    reference's main path but part of its filter API): process edges in
    non-decreasing weight order, merging components when the edge weight is
    below both components' adaptive thresholds tau = max_internal_weight +
    c / component_size. Returns (n_vertices,) int32 component labels,
    renumbered densely in first-occurrence order."""
    order = np.argsort(weights, kind="stable")
    edges = np.asarray(edges, np.int64)[order]
    weights = np.asarray(weights, np.float64)[order]
    parent = np.arange(n_vertices)
    size = np.ones(n_vertices, np.int64)
    threshold = np.full(n_vertices, float(c), np.float64)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for (a, b), w in zip(edges, weights):
        ra, rb = find(int(a)), find(int(b))
        if ra == rb:
            continue
        if w <= threshold[ra] and w <= threshold[rb]:
            parent[ra] = rb
            size[rb] += size[ra]
            threshold[rb] = w + c / size[rb]
    roots = np.array([find(i) for i in range(n_vertices)])
    _, first = np.unique(roots, return_index=True)
    remap = {int(roots[i]): k for k, i in enumerate(np.sort(first))}
    return np.array([remap[int(r)] for r in roots], np.int32)


def refine_models(models: List[PlaneModel], pts: np.ndarray,
                  nrm: np.ndarray) -> None:
    """rspf__refine_plane_models (rs_pointcloud_filters.cpp:438-490):
    average center/normal, build in-plane axes, compute extent rectangle."""
    for m in models:
        ii = m.inlier_ind
        m.n_inliers = len(ii)
        m.center = pts[ii].mean(axis=0)
        nn = nrm[ii].mean(axis=0)
        m.normal = nn / max(np.linalg.norm(nn), 1e-30)
        axes = np.zeros((3, 3), dtype=np.float64)
        axes[:, 2] = m.normal
        ref_axis = (np.array([0.0, 0, 1]) if m.normal[1] > 0.8
                    else np.array([0.0, 1, 0]))
        a0 = np.cross(ref_axis, axes[:, 2])
        a0 /= max(np.linalg.norm(a0), 1e-30)
        a1 = np.cross(a0, axes[:, 2])
        a1 /= max(np.linalg.norm(a1), 1e-30)
        axes[:, 0] = a0
        axes[:, 1] = a1
        m.axes = axes
        local = (pts[ii] - m.center) @ axes
        m.extends = np.array([local[:, 0].max(), local[:, 1].max(),
                              local[:, 0].min(), local[:, 1].min()])


def detect_planes(scene) -> List[PlaneModel]:
    """rspf_detect_planes (rs_pointcloud_filters.cpp:493-528): RANSAC at
    level 2, inlier gathering + CC split + refine at level 0."""
    lvl = config.PLANE_DETECT_LVL
    pts2, nrm2 = scene.pos(lvl), scene.nrm(lvl)
    engine = PlaneCountsEngine(pts2)   # points shipped to device once
    models = detect_floor(pts2, nrm2, engine) + detect_walls(pts2, nrm2,
                                                             engine)
    print(f"RSPF_PLANE_DETECTOR: Found {len(models)} large planes.")
    pts0, nrm0 = scene.pos(0), scene.nrm(0)
    gather_inliers(models, pts0, nrm0, config.PLANE_DOT_THRESHOLD,
                   config.PLANE_INLIER_DIST)
    models = split_connected_components(models, pts0)
    refine_models(models, pts0, nrm0)
    print(f"RSPF_PLANE_DETECTOR: Split into {len(models)} connected components.")
    return models


def compute_plane_features(scene, models: List[PlaneModel]) -> None:
    """rspf_compute_plane_features (rs_pointcloud_filters.cpp:530-565)."""
    for m in models:
        m.normal_up_dot = float(m.normal[1])
        m.count = m.n_inliers
        corners = _extent_polygon(m)
        m.max_y = float(corners[:, 1].max())
        q = scene.levels[0]["qualities"][m.inlier_ind]
        # the reference sums quality floats into a size_t (truncation);
        # qualities are exactly 0/1 here so a plain mean matches
        m.saliency = float(q.astype(np.int64).sum()) / max(m.count, 1)


def classify_planes(scene, models: List[PlaneModel]) -> None:
    """rspf_classify_planes (rs_pointcloud_filters.cpp:568-614): label
    level-0 inliers of accepted planes as wall (1) / floor (2), instance =
    plane index, quality 0."""
    lvl0 = scene.levels[0]
    for i, m in enumerate(models):
        m.valid = False
        cur = 0
        if m.count >= config.PLANE_CLASSIFY_INLIER_THRESHOLD:
            if m.normal_up_dot > config.PLANE_CLASSIFY_DOT:
                cur = 2  # floor
            elif (m.saliency < config.PLANE_CLASSIFY_SALIENCY
                  and m.max_y >= config.PLANE_CLASSIFY_HEIGHT):
                cur = 1  # wall
        if cur != 0:
            m.valid = True
            lvl0["class_ids"][m.inlier_ind] = cur
            lvl0["instance_ids"][m.inlier_ind] = i
            lvl0["qualities"][m.inlier_ind] = 0.0


def relabel_walls_and_floors(db, scene, models: List[PlaneModel]) -> None:
    """rspf_relabel_walls_and_floors (rs_pointcloud_filters.cpp:617-671):
    re-gather inliers of valid planes at level 1 (with extent check) and
    rewrite unlabelled/overflow ids."""
    lvl = config.RELABEL_LVL
    pts, nrm = scene.pos(lvl), scene.nrm(lvl)
    gather_inliers(models, pts, nrm, config.PLANE_DOT_THRESHOLD,
                   config.RELABEL_DIST, check_validity=True,
                   check_extends=True)
    floor_idx = db.class_idx("floor")
    wall_idx = db.class_idx("wall")
    unlabelled_idx = db.class_idx("unlabelled")
    L = scene.levels[lvl]
    for m in models:
        if not m.valid or m.inlier_ind is None:
            continue
        ii = m.inlier_ind
        inst = L["instance_ids"][ii]
        cls = L["class_ids"][ii]
        if m.normal_up_dot > config.RELABEL_DOT:
            inst = np.where(inst >= config.MAX_INSTANCES, 0, inst)
            cls = np.where(cls == unlabelled_idx, floor_idx, cls)
        else:
            inst = np.where(inst >= config.MAX_INSTANCES, 1, inst)
            cls = np.where(cls == unlabelled_idx, wall_idx, cls)
        L["instance_ids"][ii] = inst
        L["class_ids"][ii] = cls
