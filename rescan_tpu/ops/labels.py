"""Label transfer from placed objects and multi-label MRF smoothing.

Label transfer mirrors rspf_arrangement_to_labels
(lib/rs/rs_pointcloud_filters.cpp:780-879): placements sorted dynamic-first
(by (is_static << 10 | class_idx)), each placement claims scene points whose
inverse-transformed position has a 1-NN within radius in the object cloud
AND whose normal is within 70 degrees (|dot|); closest claim wins via a
running min-distance; the static pass runs at 1.5x radius without resetting
the distances (prioritize_static = false in the pipeline,
apps/segment_transfer/main.cpp:389).

Smoothing substitutes the reference's gco alpha-beta-swap graph cut
(rspf_smooth_labels, :882-989) with a TPU-native mean-field relaxation +
masked ICM polish over the identical energy:

    E = sum_i unary_i(l_i) + sum_(ij in E) int(w_ij * 10) * 10 * [l_i != l_j]
    unary: 0 for the current label else 30 (dynamic) / 15 (static) /
           1 (unlabelled);  w_ij = (1 - (d2/(4 r^2))^15) * clamp(dot,0,1)^16

This substitution is the designated algorithm change of the rebuild
(BASELINE.json north star); fidelity is gated on end metrics.
"""

from __future__ import annotations

import os
import time
from typing import Sequence, Tuple

import numpy as np

from .. import config
from ..io.rsdb import Placement, Rsdb
from . import search as search_ops


def _static_sort_key(db: Rsdb, p: Placement) -> int:
    """rsfp__static_plcmnt_cmp (rs_pointcloud_filters.cpp:724-736):
    ascending (is_static << 10 | class_idx). The reference uses unstable
    qsort; we use a stable sort (tie order within a key is unspecified
    there anyway)."""
    return (int(db.is_object_static(p.object_idx)) << 10) | \
        db.objects[p.object_idx].class_idx


def arrangement_to_labels(db: Rsdb, scene, arrangement: Sequence[Placement],
                          radius: float = config.LABEL_TRANSFER_RADIUS,
                          prioritize_static: bool = False,
                          mesh=None) -> None:
    """Write class/instance ids into scene level 1 from the arrangement.

    Device path: per placement, ONE gated-NN launch of the (bbox-filtered)
    scene points against the OBJECT's search index — the index is built
    once per object and reused across that object's placements and both
    passes (the reference rebuilds a host hash grid per placement,
    rs_pointcloud_filters.cpp:745-750). The launch returns the un-gated
    nearest neighbor plus its |normal dot|; the 70-degree gate is applied
    after, exactly like the reference (nearest-THEN-gate, :758-771 — NOT
    nearest-gate-passing).

    ``mesh``: a jax.sharding.Mesh — each launch's QUERY axis shards over
    every mesh device (parallel.mesh.nearest_gated_sharded); the object
    index replicates. Labels are identical to the single-device path
    (tests/test_parallel.py gates) — the per-query 1-NN has no cross-query
    reduction, so sharding changes no arithmetic."""
    import jax.numpy as jnp

    lvl = config.LABEL_LVL
    pts = scene.pos(lvl)
    nrm = scene.nrm(lvl)
    n = len(pts)
    labels = np.zeros(n, np.int32)
    min_d2 = np.full(n, 1e9, np.float32)

    order = sorted(range(len(arrangement)),
                   key=lambda i: _static_sort_key(db, arrangement[i]))
    sorted_arr = [arrangement[i] for i in order]
    first_static = 0
    for i, p in enumerate(sorted_arr):
        if db.is_object_static(p.object_idx):
            first_static = i
            break
    # quirk preserved: if no placement is static, first_static stays 0 and
    # the "static" pass (1.5x radius) covers the whole arrangement
    # (rs_pointcloud_filters.cpp:830-848)

    cos_gate = np.cos(np.deg2rad(config.LABEL_TRANSFER_MAX_ANGLE_DEG))
    max_r = config.LABEL_TRANSFER_STATIC_RADIUS_SCALE * radius
    index_cache = {}

    def obj_index(obj_idx: int):
        e = index_cache.get(obj_idx)
        if e is None:
            obj = db.objects[obj_idx].cloud
            e = search_ops.build_index(obj.pos(lvl), max_r,
                                       normals=obj.nrm(lvl),
                                       tile_bucket="pow2")
            index_cache[obj_idx] = e
        return e

    if prioritize_static:
        r2 = radius
    else:
        r2 = config.LABEL_TRANSFER_STATIC_RADIUS_SCALE * radius

    # precompute every placement's (inverse-transformed queries, bbox
    # candidate set) so ONE query bucket — pow2 of the LARGEST candidate
    # count — serves all launches of both passes. Both passes share one
    # compiled program per object slab shape; bucketing by the candidate
    # max (not the scene size) keeps the launch ~8x smaller while staying
    # a single bucket per scene (per-placement pow2 buckets measured 3-5
    # kernel variants at ~10-30 s of tunnel compile each).
    plans = []
    for i, p in enumerate(sorted_arr):
        r = radius if i < first_static else r2
        obj = db.objects[p.object_idx].cloud
        inv = np.linalg.inv(p.pose.astype(np.float64)).astype(np.float32)
        q = pts @ inv[:3, :3].T + inv[:3, 3]
        # normal "matrix" is the TRANSPOSE of the pose
        # (rs_pointcloud_filters.cpp:751): R^T = R^-1 for rigid poses
        qn = nrm @ p.pose[:3, :3].astype(np.float32)
        # bbox prefilter: only scene points near the object can match
        bmin = obj.pos(lvl).min(axis=0) - r
        bmax = obj.pos(lvl).max(axis=0) + r
        cand = np.where(((q >= bmin) & (q <= bmax)).all(axis=1))[0]
        plans.append((i, r, cand, q[cand], qn[cand]))
    max_cand = max((len(c) for _, _, c, _, _ in plans), default=0)
    mp = max(1 << int(np.ceil(np.log2(max(max_cand, 1)))), 256)

    profile = os.environ.get("RESCAN_LABEL_PROFILE") == "1"

    def submit(start: int, end: int):
        """Dispatch every placement's gated-NN launch without fetching —
        JAX async dispatch overlaps the device work across placements; the
        merge below fetches in placement order, so the running-min claim
        semantics are untouched."""
        pend = []
        for i, r, cand, qc, qnc in plans[start:end]:
            m = len(cand)
            if m == 0:
                continue
            p = sorted_arr[i]
            t0 = time.perf_counter() if profile else 0.0
            # far-sentinel padding: whole padding blocks cost only the
            # kernel prologue
            qp = np.full((mp, 3), 1e6, np.float32)
            qp[:m] = qc
            qnp = np.zeros((mp, 3), np.float32)
            qnp[:m] = qnc
            # cos_gate -1: every neighbor passes, so this is the plain
            # nearest-in-radius, with the selected neighbor's |dot|
            from . import pallas_nn as _pn
            idxo = obj_index(p.object_idx)
            if mesh is not None and mp % mesh.devices.size == 0:
                from ..parallel import mesh as _pm
                idx, d2, dot = _pm.nearest_gated_sharded(
                    mesh, idxo, qp, qnp, r, -1.0, use_abs_dot=True,
                    bq=_pn.block_for_index(idxo, mp // mesh.devices.size))
            else:
                idx, d2, dot = search_ops.nearest_gated(
                    idxo, jnp.asarray(qp), jnp.asarray(qnp), r, -1.0,
                    use_abs_dot=True, bq=_pn.block_for_index(idxo, mp))
            if profile:
                print(f"LABEL_PROFILE: submit plc={i} obj={p.object_idx} "
                      f"m={m} mp={mp} dispatch={time.perf_counter()-t0:.3f}s")
            pend.append((i, cand, m, idx, d2, dot))
        return pend

    def merge(pend):
        for i, cand, m, idx, d2, dot in pend:
            t0 = time.perf_counter() if profile else 0.0
            idx = np.asarray(idx)[:m]
            if profile:
                print(f"LABEL_PROFILE: fetch plc={i} m={m} "
                      f"wait={time.perf_counter()-t0:.3f}s")
            nd2 = np.asarray(d2)[:m]
            dot = np.asarray(dot)[:m]
            hit = idx >= 0
            ci, nd2, dot = cand[hit], nd2[hit], dot[hit]
            better = nd2 < min_d2[ci]
            ci, nd2, dot = ci[better], nd2[better], dot[better]
            ok = dot > cos_gate  # angle < 70 deg
            ci, nd2 = ci[ok], nd2[ok]
            min_d2[ci] = nd2
            labels[ci] = i + 1

    merge(submit(0, first_static))
    if prioritize_static:
        min_d2[:] = 1e9
    merge(submit(first_static, len(sorted_arr)))

    unlabelled_idx = db.class_idx("unlabelled")
    cls = np.full(n, unlabelled_idx, np.int32)
    ins = np.full(n, config.MAX_INSTANCES, np.int32)
    for i, p in enumerate(sorted_arr):
        sel = labels == (i + 1)
        cls[sel] = db.objects[p.object_idx].class_idx
        ins[sel] = p.uidx
    scene.levels[lvl]["class_ids"] = cls
    scene.levels[lvl]["instance_ids"] = ins


# ---------------------------------------------------------------------------
# MRF smoothing
# ---------------------------------------------------------------------------

def build_smoothing_graph(scene) -> Tuple[np.ndarray, np.ndarray]:
    """8-NN 0.05-radius edge graph with the reference's edge weights
    (rspf_compute_neighborhood, rs_pointcloud_filters.cpp:674-722).
    Returns (edges (E,2) int32 deduped unordered pairs, weights (E,)).

    Engine dispatch: a k-NN radius query is a scalar-gather workload — on
    the TPU backend the query runs on the HOST C++ counting-sort grid
    (core/native, 0.8 s for a 300k-point level; the device radius_knn
    kernel measured 50x slower through the remote tunnel), while CPU
    backends use the batched device kernel (ops/hashgrid.radius_knn)."""
    import jax

    lvl = config.LABEL_LVL
    pts = scene.pos(lvl)
    nrm = scene.nrm(lvl)
    r = config.SMOOTH_RADIUS
    from ..core import native
    if jax.default_backend() == "cpu":
        import jax.numpy as jnp

        from . import hashgrid
        grid = hashgrid.build_grid(pts, r)
        idx, d2, cnt = hashgrid.radius_knn(grid, jnp.asarray(pts), r,
                                           config.SMOOTH_MAX_NN,
                                           chunk=16384)
        idx = np.asarray(idx)
        d2 = np.asarray(d2)
    else:
        grid = native.HostGrid(pts, r)
        idx, d2, cnt = grid.radius_search(pts, r, config.SMOOTH_MAX_NN)
    # shared post-pass (skip-self, dedup, reference weights) in the native
    # lib — the numpy masks/unique over the 2.4M directed entries cost
    # ~2.5 s of the smoothing budget on the 1-core host
    return native.smooth_graph(idx, d2, nrm, np.float32(r * r),
                               config.SMOOTH_DIST_EXP,
                               config.SMOOTH_ANGLE_EXP)


def smooth_labels(db: Rsdb, scene, n_meanfield: int = 30,
                  n_icm: int = 8, engine: str | None = None) -> None:
    """Smoothing of level-1 instance labels over the reference's unary +
    weighted-Potts energy (rspf_smooth_labels,
    rs_pointcloud_filters.cpp:882-989).

    Engine dispatch: the PRODUCTION DEFAULT is ``abswap`` — the native
    alpha-beta-swap engine replicating the reference's gco swap(2) move
    space (:955-968). SMOOTHING_PARITY_r05_NOISY measured the mean-field
    substitute diverging on noisy scenes (17% label disagreement, Potts
    energy 743k vs 78k, end-metric deltas ~0.09-0.19 on the noisy
    sequence), so graph-cut fidelity wins the default despite ~+8 s per
    timestep. The mean-field + masked-ICM engines remain selectable as
    the fast path (``engine='native'`` for the host kernel, ``'jax'``
    for the multi-chip identical-update path; env RESCAN_SMOOTH_ENGINE
    overrides) — all three optimize the identical integer energy and
    their agreement is unit-tested in tests/test_energy_labels.py."""
    import os as _os

    engine = engine or _os.environ.get("RESCAN_SMOOTH_ENGINE", "abswap")

    lvl = config.LABEL_LVL
    L = scene.levels[lvl]
    n = len(L["class_ids"])
    inst = L["instance_ids"]
    cls = L["class_ids"]
    unlabelled_idx = db.class_idx("unlabelled")

    valid_inst = inst[inst < config.MAX_INSTANCES]
    max_uidx = int(valid_inst.max()) if len(valid_inst) else -1
    n_labels = max_uidx + 5
    if n_labels < 2:
        return
    # bucket the label axis (multiple of 8) so growing instance counts
    # reuse the compiled mean-field/ICM programs across timesteps
    n_labels = ((n_labels + 7) // 8) * 8

    labels0 = np.where(cls == unlabelled_idx, 0, inst + 1).astype(np.int32)
    labels0 = np.clip(labels0, 0, n_labels - 1)
    # label -> (class, instance) maps built like the reference (last point
    # of each label wins, :908-917)
    label_to_class = np.full(n_labels, unlabelled_idx, np.int32)
    label_to_inst = np.full(n_labels, config.MAX_INSTANCES, np.int32)
    label_to_class[labels0] = cls
    label_to_inst[labels0] = inst

    # unary: 0 for own label, else 30/15/1 by the point's label class
    is_static = np.array([db.is_class_static(int(c))
                          for c in label_to_class])
    cost_of_point = np.where(is_static[labels0],
                             config.SMOOTH_COST_STATIC,
                             config.SMOOTH_COST_DYNAMIC)
    cost_of_point = np.where(labels0 == 0, config.SMOOTH_COST_UNLABELLED,
                             cost_of_point).astype(np.float32)

    edges, w = build_smoothing_graph(scene)
    # gco receives int(w * edge_cost) as the neighbor weight, multiplied by
    # the Potts table value edge_cost (:942-966)
    pair_w = (np.floor(w * config.SMOOTH_EDGE_COST).astype(np.float32)
              * config.SMOOTH_EDGE_COST)

    # ICM masks: drawn over the PADDED point count in both engines so the
    # two paths consume the identical rng stream (the JAX engine pads to a
    # pow2 bucket for compile reuse; padding nodes have no edges)
    n_real = n
    n_pad = max(1 << int(np.ceil(np.log2(max(n, 1)))), 1024)
    rng = np.random.default_rng(config.SA_SEED)
    icm_masks = (rng.random((n_icm, n_pad)) < 0.5)

    if engine == "abswap":
        # PRODUCTION DEFAULT: the reference's gco swap(2) move space
        # reimplemented natively (rescan_abswap) over the identical
        # integer energy (rs_pointcloud_filters.cpp:955-968). Also the
        # oracle tools/run_smoothing_parity.py measures the mean-field
        # engines against.
        from ..core import native
        off, nbr, w2 = native.csr_from_edges(edges[:, 0], edges[:, 1],
                                             pair_w, n_real)
        labels = native.abswap(
            cost_of_point[:, None]
            * (1.0 - np.eye(n_labels, dtype=np.float32)[labels0]),
            off, nbr, w2, labels0, n_cycles=2)
        L["class_ids"] = label_to_class[labels].astype(np.int32)
        L["instance_ids"] = label_to_inst[labels].astype(np.int32)
        return

    if engine == "native":
        # renumber nodes along a Morton curve: scene points arrive in
        # resample/shuffle order, so CSR neighbor gathers would be random
        # DRAM accesses; spatial renumbering makes neighbor rows
        # cache-resident (measured 2.6x on the bench-scale graph). Jacobi
        # updates are node-order independent, so only float summation
        # order shifts (engine agreement still holds).
        from .pallas_nn import morton_order
        perm = morton_order(scene.pos(lvl), cell=0.1)  # new -> old
        inv = np.empty(n_real, np.int64)
        inv[perm] = np.arange(n_real)
        lab_s = labels0[perm]
        onehot = np.zeros((n_real, n_labels), np.float32)
        onehot[np.arange(n_real), lab_s] = 1.0
        U = cost_of_point[perm, None] * (1.0 - onehot)
        # symmetrized CSR adjacency (both directions of each unordered pair)
        from ..core import native
        off, nbr, w2 = native.csr_from_edges(
            inv[edges[:, 0]], inv[edges[:, 1]], pair_w, n_real)
        labels_s = native.meanfield_icm(U, off, nbr, w2,
                                        n_meanfield, 0.25, onehot,
                                        icm_masks[:, :n_real][:, perm])
        labels = np.empty(n_real, np.int32)
        labels[perm] = labels_s
        L["class_ids"] = label_to_class[labels].astype(np.int32)
        L["instance_ids"] = label_to_inst[labels].astype(np.int32)
        return

    import jax
    import jax.numpy as jnp

    _init_jits()
    n = n_pad
    E = len(edges)
    Ep = max(1 << int(np.ceil(np.log2(max(E, 1)))), 1024)
    edges_p = np.zeros((Ep, 2), np.int32)
    edges_p[:E] = edges
    pw_p = np.zeros(Ep, np.float32)
    pw_p[:E] = pair_w
    cost_p = np.zeros(n, np.float32)
    cost_p[:n_real] = cost_of_point
    own_p = np.zeros(n, np.int32)
    own_p[:n_real] = labels0

    e_src = jnp.asarray(edges_p[:, 0])
    e_dst = jnp.asarray(edges_p[:, 1])
    e_w = jnp.asarray(pw_p)
    unary_cost = jnp.asarray(cost_p)
    own = jnp.asarray(own_p)

    # (n, n_labels): 0 at own label else cost_of_point
    U = (unary_cost[:, None]
         * (1 - jax.nn.one_hot(own, n_labels, dtype=jnp.float32)))

    Q0 = jax.nn.one_hot(own, n_labels, dtype=jnp.float32)
    Q = _meanfield(U, Q0, e_src, e_dst, e_w, n_meanfield)
    labels = np.asarray(jnp.argmax(Q, axis=1)).astype(np.int32)

    # masked ICM polish: random halves updated per sweep (deterministic)
    lab = jnp.asarray(labels)
    for k in range(n_icm):
        lab = _icm_step(U, lab, jnp.asarray(icm_masks[k]), e_src, e_dst, e_w)
    labels = np.asarray(lab)[:n_real]

    L["class_ids"] = label_to_class[labels].astype(np.int32)
    L["instance_ids"] = label_to_inst[labels].astype(np.int32)


def potts_energy(U: np.ndarray, edges: np.ndarray, pair_w: np.ndarray,
                 labels: np.ndarray) -> float:
    """E(l) = sum_i U[i, l_i] + sum_(ij) w_ij [l_i != l_j] over the
    undirected edge list — the objective every smoothing engine optimizes
    (integer-valued by construction; used for engine comparison)."""
    unary = float(U[np.arange(len(labels)), labels].sum())
    cut = float(pair_w[labels[edges[:, 0]] != labels[edges[:, 1]]].sum())
    return unary + cut


def _meanfield_impl(U, Q, e_src, e_dst, e_w, n_mf: int):
    """Damped mean-field over the Potts MRF (fixed-length scan — a
    convergence-gated while_loop variant measured SLOWER both cold and
    warm on this runtime)."""
    import jax
    import jax.numpy as jnp

    n, n_labels = U.shape
    wsum = jnp.zeros((n,), jnp.float32)
    wsum = wsum.at[e_src].add(e_w).at[e_dst].add(e_w)

    def body(Q, _):
        # neighbor agreement per label: sum_j w_ij * Q_j(l)
        agree = jnp.zeros((n, n_labels), jnp.float32)
        agree = agree.at[e_src].add(e_w[:, None] * Q[e_dst])
        agree = agree.at[e_dst].add(e_w[:, None] * Q[e_src])
        E = U + (wsum[:, None] - agree)
        Qn = jax.nn.softmax(-E / 4.0, axis=1)
        return 0.5 * Q + 0.5 * Qn, None

    Q, _ = jax.lax.scan(body, Q, None, length=n_mf)
    return Q


def _icm_step_impl(U, lab, mask, e_src, e_dst, e_w):
    import jax
    import jax.numpy as jnp

    n, n_labels = U.shape
    agree = jnp.zeros((n, n_labels), jnp.float32)
    oh_dst = jax.nn.one_hot(lab[e_dst], n_labels, dtype=jnp.float32)
    oh_src = jax.nn.one_hot(lab[e_src], n_labels, dtype=jnp.float32)
    agree = agree.at[e_src].add(e_w[:, None] * oh_dst)
    agree = agree.at[e_dst].add(e_w[:, None] * oh_src)
    wsum = jnp.zeros((n,), jnp.float32)
    wsum = wsum.at[e_src].add(e_w).at[e_dst].add(e_w)
    E = U + (wsum[:, None] - agree)
    best = jnp.argmin(E, axis=1).astype(lab.dtype)
    return jnp.where(mask, best, lab)


_meanfield = None
_icm_step = None


def _init_jits():
    """Module-level jits (a per-call closure would bake the captured edge
    arrays in as constants and recompile for every scene)."""
    global _meanfield, _icm_step
    if _meanfield is None:
        import jax
        _meanfield = jax.jit(_meanfield_impl, static_argnames=("n_mf",))
        _icm_step = jax.jit(_icm_step_impl)
