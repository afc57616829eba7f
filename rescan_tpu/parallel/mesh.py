"""Device-mesh parallelism for the rescan pipeline.

The reference is a single-process CPU pipeline whose only parallelism is
OpenMP over hash-grid query batches (SURVEY.md §2.6). The TPU-native scaling
axes are:

* dp — the pose-HYPOTHESIS axis: the grid-search lattice and the ICP
  refinement batch are embarrassingly parallel across chips.
* sp — the POINT axis: per-hypothesis scores are means over object points,
  so each chip scores a point shard and the mean reduces with one psum
  over the ICI ring.

Both are expressed with `shard_map` over a 2-D `jax.sharding.Mesh`; the
scene search grid is replicated (it is read-only and small next to the
hypothesis workload). No custom transport: XLA lowers the psum onto ICI.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from .. import config
from ..ops import hashgrid, search


def active_device_count() -> int:
    """Devices the production stages should mesh over: all of them, unless
    RESCAN_DEVICES=N caps the mesh to the first N (scaling studies —
    tools/run_scaling.py — and single-device A/B runs)."""
    import os
    return (int(os.environ.get("RESCAN_DEVICES", "0") or 0)
            or len(jax.devices()))


def make_mesh(n_devices: Optional[int] = None,
              sp: int = 1) -> Mesh:
    """A (dp, sp) mesh over the first n_devices devices."""
    devs = jax.devices()
    n = n_devices or active_device_count()
    dp = n // sp
    arr = np.array(devs[:dp * sp]).reshape(dp, sp)
    return Mesh(arr, axis_names=("dp", "sp"))


def make_flat_mesh(n_devices: Optional[int] = None) -> Mesh:
    """A 1-D ("dp",) mesh over the first n_devices devices — the
    production stages' hypothesis/batch axis."""
    devs = jax.devices()
    n = n_devices or active_device_count()
    return Mesh(np.array(devs[:n]), axis_names=("dp",))


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.lru_cache(maxsize=16)
def _sharded_score_multi(mesh: Mesh):
    """shard_map'd ops.score._score_multi_impl: hypotheses + owners split
    over every mesh device (row-major over all axes), scene index and
    object tables replicated. Cached per mesh so launches reuse the
    compiled program."""
    from ..ops.score import _score_multi_impl

    axes = tuple(mesh.axis_names)

    def fn(grid_, pts_all, nrm_all, mask_all, hyps, owner, radius, sigma):
        return _score_multi_impl(grid_, pts_all, nrm_all, mask_all, hyps,
                                 owner, radius, sigma)

    return jax.jit(jax.shard_map(
        fn, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(axes), P(axes), P(), P()),
        out_specs=P(axes), check_vma=False))


def score_multi_sharded(mesh: Mesh, grid, pts_all, nrm_all, mask_all,
                        hyps, owner, radius, sigma):
    """Production-stage scoring launch with the hypothesis axis sharded
    over all mesh devices. len(hyps) must be a multiple of the mesh size
    (ScoreStream sizes its slices accordingly)."""
    return _sharded_score_multi(mesh)(
        grid, pts_all, nrm_all, mask_all, hyps, owner,
        jnp.float32(radius), jnp.float32(sigma))


def score_hypotheses_sharded(mesh: Mesh, grid: hashgrid.HashGrid,
                             obj_pts: np.ndarray, obj_nrm: np.ndarray,
                             hyps: np.ndarray, radius: float, sigma: float,
                             chunk: int = 2048) -> np.ndarray:
    """Score H hypotheses with hypotheses sharded over ``dp`` and object
    points sharded over ``sp`` (partial per-point sums psum-reduced).

    Returns (H,) scores, identical to ops.score.score_hypotheses up to
    reduction order.
    """
    dp = mesh.shape["dp"]
    sp = mesh.shape["sp"]
    H, P_ = len(hyps), len(obj_pts)
    Hp = _round_up(max(H, 1), dp)
    Pp = _round_up(max(P_, 1), sp)

    hyps_p = np.zeros((Hp, 4, 4), np.float32)
    hyps_p[:H] = hyps
    hyps_p[H:, 0, 0] = hyps_p[H:, 1, 1] = hyps_p[H:, 2, 2] = hyps_p[H:, 3, 3] = 1
    pts_p = np.zeros((Pp, 3), np.float32)
    pts_p[:P_] = obj_pts
    nrm_p = np.zeros((Pp, 3), np.float32)
    nrm_p[:P_] = obj_nrm
    mask_p = np.zeros((Pp,), bool)
    mask_p[:P_] = True

    cos_gate = float(np.cos(np.deg2rad(config.SCORE_MAX_ANGLE_DEG)))

    def shard_fn(grid_, pts, nrm, mask, mats):
        h = mats.shape[0]
        p = pts.shape[0]
        R = mats[:, :3, :3]
        t = mats[:, :3, 3]
        q = jnp.einsum("hij,pj->hpi", R, pts) + t[:, None, :]
        qn = jnp.einsum("hij,pj->hpi", R, nrm)
        idx, d2, dot = search.nearest_gated(
            grid_, q.reshape(h * p, 3), qn.reshape(h * p, 3), radius,
            cos_gate, chunk=chunk)
        found = (idx >= 0).reshape(h, p) & mask[None, :]
        d2 = d2.reshape(h, p)
        dot = jnp.clip(dot.reshape(h, p), 0.0, 1.0)
        ang = jnp.arccos(dot)
        per_pt = (config.SCORE_ALPHA
                  * jnp.exp(-(ang * ang) / (2 * config.SCORE_NORMAL_SIGMA ** 2))
                  + (1 - config.SCORE_ALPHA)
                  * jnp.exp(-d2 / (2 * sigma * sigma)))
        per_pt = jnp.where(found, per_pt, 0.0)
        # partial sums over this chip's point shard -> reduce over "sp"
        psum = jax.lax.psum(jnp.sum(per_pt, axis=1), axis_name="sp")
        cnt = jax.lax.psum(jnp.sum(mask), axis_name="sp")
        return psum / jnp.maximum(cnt, 1)

    grid_specs = jax.tree_util.tree_map(lambda _: P(), grid)
    fn = jax.jit(jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(grid_specs, P("sp"), P("sp"), P("sp"), P("dp")),
        out_specs=P("dp")))
    out = fn(grid, jnp.asarray(pts_p), jnp.asarray(nrm_p),
             jnp.asarray(mask_p), jnp.asarray(hyps_p))
    return np.asarray(out)[:H]


def icp_refine_sharded(mesh: Mesh, grid: hashgrid.HashGrid,
                       pts_b: np.ndarray, nrm_b: np.ndarray,
                       mask_b: np.ndarray, T_init: np.ndarray,
                       max_dist: float, max_angle: float
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """Batched ICP with the (object, proposal) batch sharded over all mesh
    devices (dp*sp); each pair is independent so no collectives are needed
    beyond the final gather."""
    from ..ops import icp

    n_dev = mesh.devices.size
    B = len(T_init)
    Bp = _round_up(max(B, 1), n_dev)

    def pad(a, fill=0):
        out = np.zeros((Bp,) + a.shape[1:], a.dtype)
        out[:B] = a
        return out

    T_p = pad(np.asarray(T_init, np.float32))
    T_p[B:] = np.eye(4, dtype=np.float32)

    flat = Mesh(mesh.devices.reshape(-1), axis_names=("b",))

    def shard_fn(grid_, pts, nrm, mask, T0):
        return icp.icp_align_batched(pts, nrm, mask, grid_, T0,
                                     max_dist, max_angle)

    grid_specs = jax.tree_util.tree_map(lambda _: P(), grid)
    fn = jax.jit(jax.shard_map(
        shard_fn, mesh=flat,
        in_specs=(grid_specs, P("b"), P("b"), P("b"), P("b")),
        out_specs=(P("b"), P("b")),
        check_vma=False))
    T, err = fn(grid, jnp.asarray(pad(pts_b)), jnp.asarray(pad(nrm_b)),
                jnp.asarray(pad(mask_b)), jnp.asarray(T_p))
    return np.asarray(T)[:B], np.asarray(err)[:B]


def icp_refine_indexed_sharded(mesh: Mesh, grid, uobj_pts, uobj_nrm,
                               uobj_mask, obj_of_pair: np.ndarray,
                               pair_valid: np.ndarray, T_init: np.ndarray,
                               max_dist: float, max_angle: float
                               ) -> Tuple[np.ndarray, np.ndarray]:
    """icp_align_indexed with the PAIR axis sharded over all mesh devices;
    the small unique-object tables and the scene grid are replicated (the
    batch gather happens device-side per shard, so the host never
    materializes nor ships the (B, N, 3) batch)."""
    from ..ops import icp

    n_dev = mesh.devices.size
    B = len(T_init)
    Bp = _round_up(max(B, 1), n_dev)

    T_p = np.zeros((Bp, 4, 4), np.float32)
    T_p[:B] = np.asarray(T_init, np.float32)
    T_p[B:] = np.eye(4, dtype=np.float32)
    own_p = np.zeros(Bp, np.int32)
    own_p[:B] = obj_of_pair
    val_p = np.zeros(Bp, bool)
    val_p[:B] = pair_valid

    flat = Mesh(mesh.devices.reshape(-1), axis_names=("b",))

    def shard_fn(grid_, upts, unrm, umask, own, val, T0):
        T, err, _ = icp.icp_align_indexed(upts, unrm, umask, own, val,
                                          grid_, T0, max_dist, max_angle)
        return T, err

    grid_specs = jax.tree_util.tree_map(lambda _: P(), grid)
    fn = jax.jit(jax.shard_map(
        shard_fn, mesh=flat,
        in_specs=(grid_specs, P(), P(), P(), P("b"), P("b"), P("b")),
        out_specs=(P("b"), P("b")),
        check_vma=False))
    T, err = fn(grid, jnp.asarray(uobj_pts), jnp.asarray(uobj_nrm),
                jnp.asarray(uobj_mask), jnp.asarray(own_p),
                jnp.asarray(val_p), jnp.asarray(T_p))
    return np.asarray(T)[:B], np.asarray(err)[:B]


_label_nn_cache: dict = {}


def nearest_gated_sharded(mesh: Mesh, index, q_pos: np.ndarray,
                          q_nrm: np.ndarray, radius: float, cos_gate: float,
                          use_abs_dot: bool = False, bq: int = 256):
    """search.nearest_gated with the QUERY axis sharded over every mesh
    device — the label-transfer launch (rspf_arrangement_to_labels,
    rs_pointcloud_filters.cpp:780-879, OpenMP-parallel over query batches
    in the reference). The object index is replicated (small next to the
    scene query batch); each query's gated 1-NN is independent, so the
    launch needs NO collectives — outputs stay query-sharded until the
    host fetch. len(q_pos) must be a multiple of the mesh size (the label
    path's pow2 query bucket guarantees it for pow2 meshes).

    radius/cos_gate ride as traced f32 scalars (SMEM inputs of the Pallas
    kernel), so the two label radii (dynamic pass, 1.5x static pass) share
    one compiled program per (mesh, index-structure, bq)."""
    treedef = jax.tree_util.tree_structure(index)
    key = (mesh, use_abs_dot, bq, treedef)
    fn_s = _label_nn_cache.get(key)
    if fn_s is None:
        axes = tuple(mesh.axis_names)

        def fn(index_, qp, qn, r, cg):
            return search.nearest_gated(index_, qp, qn, r, cg,
                                        use_abs_dot=use_abs_dot, bq=bq)

        index_specs = jax.tree_util.tree_map(lambda _: P(), index)
        fn_s = jax.jit(jax.shard_map(
            fn, mesh=mesh,
            in_specs=(index_specs, P(axes), P(axes), P(), P()),
            out_specs=(P(axes), P(axes), P(axes)), check_vma=False))
        _label_nn_cache[key] = fn_s
    return fn_s(index, jnp.asarray(q_pos), jnp.asarray(q_nrm),
                jnp.float32(radius), jnp.float32(cos_gate))


def refine_sp_factor(n_pairs: int, n_points: int,
                     n_devices: Optional[int] = None) -> int:
    """The sp (point-axis) factor for a refine-ICP launch: how many chips
    each pair's point run should span. >1 only when pairs alone cannot
    fill the mesh (few-pair x many-point launches — the scene-refine of a
    handful of placements); each sp shard must keep >= 512 points so the
    NN kernel's query blocks stay full."""
    n_dev = n_devices or active_device_count()
    pow2_pairs = 1 << max(int(np.ceil(np.log2(max(n_pairs, 1)))), 0)
    sp = max(1, n_dev // pow2_pairs)
    while sp > 1 and (n_points % sp != 0 or n_points // sp < 512):
        sp //= 2
    return sp


def icp_refine_indexed_dpsp(mesh2d: Mesh, grid, uobj_pts, uobj_nrm,
                            uobj_mask, obj_of_pair: np.ndarray,
                            pair_valid: np.ndarray, T_init: np.ndarray,
                            max_dist: float, max_angle: float
                            ) -> Tuple[np.ndarray, np.ndarray]:
    """Indexed ICP on the full (dp, sp) mesh: the PAIR axis shards over
    dp and the per-object POINT axis over sp — every per-pair reduction
    inside the ICP while_loop psums over "sp" (ops/icp.py::_icp_core
    axis_name), so with B < n_devices the idle chips of the flat-dp
    layout instead each take a point shard. Results equal the flat path
    up to psum reduction order (tests/test_parallel.py gates)."""
    from ..ops import icp

    dp = mesh2d.shape["dp"]
    sp = mesh2d.shape["sp"]
    B = len(T_init)
    Bp = _round_up(max(B, 1), dp)
    N = np.asarray(uobj_pts).shape[1]
    assert N % sp == 0, (N, sp)

    T_p = np.zeros((Bp, 4, 4), np.float32)
    T_p[:B] = np.asarray(T_init, np.float32)
    T_p[B:] = np.eye(4, dtype=np.float32)
    own_p = np.zeros(Bp, np.int32)
    own_p[:B] = obj_of_pair
    val_p = np.zeros(Bp, bool)
    val_p[:B] = pair_valid

    def shard_fn(grid_, upts, unrm, umask, own, val, T0):
        T, err, _ = icp.icp_align_indexed(upts, unrm, umask, own, val,
                                          grid_, T0, max_dist, max_angle,
                                          axis_name="sp")
        return T, err

    grid_specs = jax.tree_util.tree_map(lambda _: P(), grid)
    fn = jax.jit(jax.shard_map(
        shard_fn, mesh=mesh2d,
        in_specs=(grid_specs, P(None, "sp"), P(None, "sp"), P(None, "sp"),
                  P("dp"), P("dp"), P("dp")),
        out_specs=(P("dp"), P("dp")),
        check_vma=False))
    T, err = fn(grid, jnp.asarray(uobj_pts), jnp.asarray(uobj_nrm),
                jnp.asarray(uobj_mask), jnp.asarray(own_p),
                jnp.asarray(val_p), jnp.asarray(T_p))
    return np.asarray(T)[:B], np.asarray(err)[:B]
