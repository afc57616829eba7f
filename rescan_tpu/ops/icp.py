"""Batched point-to-plane ICP — all (object, pose-hypothesis) pairs refined
in one device launch.

Replaces the reference's per-call scalar ICP (lib/rs/icp.h:416-500), which
rebuilds search structures per invocation and is called once per
(object x proposal) in a host loop (the pipeline's hot loop #2,
apps/pose_proposal/main.cpp:178-204). Here the scene grid is built once and
the whole batch iterates together in a single ``lax.while_loop``; per-pair
convergence is tracked with an active mask.

Semantics mirror the reference exactly, including its quirks:

* correspondences: radius search (radius = current max_dist) on the scene,
  nearest neighbor passing ``acos(max(dot, 0)) < max_angle``
  (icp_find_corrs, icp.h:306-412)
* weights: ``(1 - d2 / max_dist) * dot`` — the reference multiplies the
  SQUARED distance by 1/max_dist (icp.h:387, ``dists`` holds distances_sq)
* outlier rejection: weights zeroed where ``d2 > 2.5 * std(d2)`` over the
  accepted correspondence set (icp.h:393-401 — again on squared distances,
  thresholded against the std alone, not mean + 2.5 sigma)
* update: Low '04 linearization about the weighted source centroid; the
  6x6 normal system solved per pair; transform composed as
  ``Trans(c1) Trans(t) Rx Ry Rz Trans(-c1) @ T``  (icp.h:280-295)
* loop: max 100 iters, stop when ``|err - prev| < 1e-5`` after iter 5,
  ``max_dist <- max(0.95 * max_dist, 0.05)`` each iter (icp.h:489-493)
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from .. import config
from . import pallas_nn, search


def _rotation_xyz(ax, ay, az):
    """R = Rx(ax) @ Ry(ay) @ Rz(az), matching the reference's composition
    order (icp.h:288-290 via msh_rotate right-multiplication)."""
    cx, sx = jnp.cos(ax), jnp.sin(ax)
    cy, sy = jnp.cos(ay), jnp.sin(ay)
    cz, sz = jnp.cos(az), jnp.sin(az)
    one = jnp.ones_like(ax)
    zero = jnp.zeros_like(ax)
    rx = jnp.stack([jnp.stack([one, zero, zero], -1),
                    jnp.stack([zero, cx, -sx], -1),
                    jnp.stack([zero, sx, cx], -1)], -2)
    ry = jnp.stack([jnp.stack([cy, zero, sy], -1),
                    jnp.stack([zero, one, zero], -1),
                    jnp.stack([-sy, zero, cy], -1)], -2)
    rz = jnp.stack([jnp.stack([cz, -sz, zero], -1),
                    jnp.stack([sz, cz, zero], -1),
                    jnp.stack([zero, zero, one], -1)], -2)
    return rx @ ry @ rz


@functools.partial(jax.jit, static_argnames=("max_iter", "chunk"))
def icp_align_batched(obj_pts: jax.Array, obj_nrm: jax.Array,
                      obj_mask: jax.Array, grid,
                      T_init: jax.Array, max_dist, max_angle,
                      max_iter: int = config.ICP_MAX_ITER,
                      chunk: int = 65536) -> Tuple[jax.Array, jax.Array]:
    T, err, _ = _icp_core(obj_pts, obj_nrm, obj_mask, grid, T_init,
                          max_dist, max_angle, max_iter, chunk)
    return T, err


def _icp_core(obj_pts, obj_nrm, obj_mask, grid, T_init, max_dist, max_angle,
              max_iter, chunk, err_init=None, it_init: int = 0,
              axis_name=None) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Refine B rigid transforms simultaneously.

    Args:
      obj_pts / obj_nrm: (B, N, 3) padded source points/normals.
      obj_mask: (B, N) validity of the padding.
      grid: scene search index (HashGrid with cell >= initial max_dist, or
        a DenseIndex; see ops/search.py).
      T_init: (B, 4, 4) initial source-to-scene transforms.
      max_dist / max_angle: scalars (the reference's icp_align params).
      axis_name: when set (inside shard_map with the POINT axis sharded
        over this mesh axis), every per-pair reduction over N becomes a
        psum over it — the "sp" tensor-parallel mode. All sp ranks derive
        active/converged from the psummed values, so their while_loops
        stay in lockstep.

    Returns (T, err): refined (B, 4, 4) transforms and final pt2pl errors.
    """
    B, N, _ = obj_pts.shape
    cos_gate = jnp.cos(max_angle)

    def _allsum(x):
        return x if axis_name is None else jax.lax.psum(x, axis_name)

    def find_corrs(T, dist, active):
        # transform sources into scene frame
        R = T[:, :3, :3]
        t = T[:, :3, 3]
        q = jnp.einsum("bij,bnj->bni", R, obj_pts) + t[:, None, :]
        qn = jnp.einsum("bij,bnj->bni", R, obj_nrm)
        # device-side compaction: converged/empty pairs move their queries
        # FAR away, so their kernel blocks have an empty near-tile range
        # and cost ~nothing — the while_loop runs until the slowest pair
        # converges, but each iteration only pays for the active set.
        # (Pairs are whole multiples of the kernel's QUERY_BLOCK, so far
        # sentinels never share a block with live queries.)
        q = jnp.where(active[:, None, None], q, 2e6)
        idx, d2, dot = search.nearest_gated(
            grid, q.reshape(B * N, 3), qn.reshape(B * N, 3), dist, cos_gate,
            chunk=chunk, bq=pallas_nn.block_for_index(grid, N))
        idx = idx.reshape(B, N)
        d2 = d2.reshape(B, N)
        dot = dot.reshape(B, N)
        ok = (idx >= 0) & obj_mask
        return q, qn, idx, d2, dot, ok

    # Precompute original-order scene arrays once.
    scene_pts, scene_nrm = search.index_arrays(grid)

    def body(state):
        T, err, dist, active, it = state
        q, qn, idx, d2, dot, ok = find_corrs(T, dist, active)
        idx_safe = jnp.maximum(idx, 0)
        p2 = scene_pts[idx_safe]
        n2 = scene_nrm[idx_safe]

        w = (1.0 - d2 / dist) * dot          # reference quirk: d^2 / max_dist
        w = jnp.where(ok, w, 0.0)
        # 2.5-sigma rejection on squared distances (icp.h:393-401)
        cnt_raw = _allsum(jnp.sum(ok, axis=1))
        cnt = jnp.maximum(cnt_raw, 1)
        d2z = jnp.where(ok, d2, 0.0)
        mean = _allsum(jnp.sum(d2z, axis=1)) / cnt
        var = _allsum(jnp.sum(jnp.where(ok, (d2 - mean[:, None]) ** 2, 0.0),
                              axis=1)) / cnt
        std = jnp.sqrt(var)
        keep = (std[:, None] <= 1e-6) | (d2 <= 2.5 * std[:, None])
        w = jnp.where(keep, w, 0.0)

        wsum = _allsum(jnp.sum(w, axis=1))
        has_corrs = (cnt_raw > 0) & (wsum > 1e-7)
        wsafe = jnp.maximum(wsum, 1e-30)

        c1 = _allsum(jnp.einsum("bn,bni->bi", w, q)) / wsafe[:, None]
        c2 = _allsum(jnp.einsum("bn,bni->bi", w, p2)) / wsafe[:, None]
        p = q - c1[:, None, :]
        qq = p2 - c2[:, None, :]
        d = p - qq
        cxn = jnp.cross(p, n2)
        ddn = jnp.einsum("bni,bni->bn", d, n2)

        # 6x6 normal system: J = [c; n] per corr (Low '04)
        j6 = jnp.concatenate([cxn, n2], axis=-1)              # (B, N, 6)
        C = _allsum(jnp.einsum("bn,bni,bnj->bij", w, j6, j6))
        b = -_allsum(jnp.einsum("bn,bni,bn->bi", w, j6, ddn))
        # damp for degenerate/ill-conditioned systems; f64 is not TPU-native,
        # so solve in f32 with scale-aware Tikhonov damping
        tr = jnp.trace(C, axis1=-2, axis2=-1)[:, None, None]
        C = C + jnp.eye(6, dtype=C.dtype)[None] * (1e-6 * tr / 6.0 + 1e-20)
        x = jnp.linalg.solve(C, b[..., None])[..., 0]
        x = jnp.where(jnp.isfinite(x), x, 0.0)

        new_err = jnp.sqrt(_allsum(jnp.einsum("bn,bn->b", w, ddn * ddn))
                           / wsafe)

        R = _rotation_xyz(x[:, 0], x[:, 1], x[:, 2])          # (B, 3, 3)
        t = x[:, 3:6]
        # T_update = Trans(c1) Trans(t) R Trans(-c1)
        upd = jnp.zeros((B, 4, 4), jnp.float32)
        upd = upd.at[:, :3, :3].set(R)
        upd = upd.at[:, :3, 3].set(c1 + t - jnp.einsum("bij,bj->bi", R, c1))
        upd = upd.at[:, 3, 3].set(1.0)

        do_update = active & has_corrs
        T_new = jnp.where(do_update[:, None, None], upd @ T, T)
        err_new = jnp.where(do_update, new_err, err)

        delta = jnp.abs(err - err_new)
        converged = (it > 5) & (delta < config.ICP_CONVERGE_DELTA)
        active_new = active & has_corrs & ~converged
        dist_new = jnp.maximum(dist * config.ICP_DIST_ANNEAL,
                               config.ICP_DIST_FLOOR)
        return (T_new, err_new, dist_new, active_new, it + 1)

    def cond(state):
        _, _, _, active, it = state
        return (it < max_iter) & jnp.any(active)

    # err/it init hooks: the straggler phase of the two-phase driver
    # (icp_refine_indexed) resumes the EXACT monolithic-loop state — pairs
    # are fully independent, so splitting the loop at any iteration
    # boundary and re-batching the still-active rows is bit-identical.
    init = (T_init.astype(jnp.float32),
            jnp.full((B,), 1e6, jnp.float32) if err_init is None
            else jnp.asarray(err_init, jnp.float32),
            jnp.asarray(max_dist, jnp.float32),
            # all-padding rows start inactive (global across sp shards)
            _allsum(jnp.sum(obj_mask, axis=1)) > 0,
            jnp.asarray(it_init, jnp.int32))
    T, err, _, active, _ = jax.lax.while_loop(cond, body, init)
    return T, err, active


@functools.partial(jax.jit,
                   static_argnames=("max_iter", "chunk", "axis_name"))
def icp_align_indexed(uobj_pts: jax.Array, uobj_nrm: jax.Array,
                      uobj_mask: jax.Array, obj_of_pair: jax.Array,
                      pair_valid: jax.Array, grid,
                      T_init: jax.Array, max_dist, max_angle,
                      max_iter: int = config.ICP_MAX_ITER,
                      chunk: int = 65536,
                      err_init=None, it_init: int = 0,
                      axis_name=None
                      ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """icp_align_batched with DEVICE-SIDE batch construction.

    The (B, N, 3) point batch tiles the same few unique objects once per
    proposal; materializing it on the host and shipping it through the
    tunnel cost ~50 MB per stage call (measured: the bulk of the
    icp_refine substage). Here only the unique tables go up:

      uobj_pts / uobj_nrm: (O, N, 3) per-unique-object padded points
        (pad_batch output over unique objects).
      uobj_mask: (O, N) validity.
      obj_of_pair: (B,) row index of each pair's object.
      pair_valid: (B,) False for batch-padding rows (start inactive).

    The gather happens inside the jit; numerics are IDENTICAL to
    icp_align_batched on the equivalent materialized batch (gathers are
    exact), which tests/test_icp.py asserts.
    """
    obj_pts = jnp.take(uobj_pts, obj_of_pair, axis=0)
    obj_nrm = jnp.take(uobj_nrm, obj_of_pair, axis=0)
    obj_mask = jnp.take(uobj_mask, obj_of_pair, axis=0) \
        & pair_valid[:, None]
    return _icp_core(obj_pts, obj_nrm, obj_mask, grid, T_init, max_dist,
                     max_angle, max_iter, chunk, err_init=err_init,
                     it_init=it_init, axis_name=axis_name)


def icp_refine_indexed(uobj_pts, uobj_nrm, uobj_mask, obj_of_pair,
                       pair_valid, grid, T_init, max_dist, max_angle,
                       phase_iters: int = 24, straggler_floor: int = 32
                       ) -> Tuple["jax.Array", "jax.Array"]:
    """Two-phase indexed ICP: run the full batch for ``phase_iters``
    while_loop iterations, then host-compact the still-active pairs into a
    small pow2 batch and finish there.

    Why: per while_loop iteration the gated-NN kernel pays its block
    prologue for EVERY query block (B x N / bq blocks) even when only a
    couple of straggler pairs are still active — ~70 ms x up to 70 tail
    iterations on the bench shapes (BUDGET_r03). Pairs are independent and
    the loop state (T, err, the globally annealed dist, it) is threaded
    exactly, so the result is IDENTICAL to the monolithic loop
    (tests/test_icp.py asserts)."""
    import numpy as np

    T, err, active = icp_align_indexed(
        jnp.asarray(uobj_pts), jnp.asarray(uobj_nrm),
        jnp.asarray(uobj_mask), jnp.asarray(obj_of_pair),
        jnp.asarray(pair_valid), grid, jnp.asarray(T_init),
        max_dist, max_angle, max_iter=phase_iters)
    act = np.asarray(active)
    if not act.any():
        return T, err
    T = np.array(T)
    err = np.array(err)
    sel = np.flatnonzero(act)
    ns = len(sel)
    Bs = max(1 << int(np.ceil(np.log2(ns))), straggler_floor)
    if Bs >= len(act):
        Bs = len(act)
        sel = np.arange(Bs)
        ns = Bs
    own2 = np.zeros(Bs, np.int32)
    own2[:ns] = np.asarray(obj_of_pair)[sel]
    val2 = np.zeros(Bs, bool)
    val2[:ns] = np.asarray(pair_valid)[sel]
    T02 = np.tile(np.eye(4, dtype=np.float32), (Bs, 1, 1))
    T02[:ns] = T[sel]
    err2 = np.full(Bs, 1e6, np.float32)
    err2[:ns] = err[sel]
    # the annealed correspondence radius after phase_iters body steps,
    # computed with the loop's own f32 arithmetic so phase 2 sees the
    # bit-identical value
    d = np.float32(max_dist)
    for _ in range(phase_iters):
        d = np.maximum(np.float32(d * np.float32(config.ICP_DIST_ANNEAL)),
                       np.float32(config.ICP_DIST_FLOOR))
    T2, err2b, _ = icp_align_indexed(
        jnp.asarray(uobj_pts), jnp.asarray(uobj_nrm),
        jnp.asarray(uobj_mask), jnp.asarray(own2), jnp.asarray(val2),
        grid, jnp.asarray(T02), d, max_angle,
        max_iter=config.ICP_MAX_ITER, err_init=err2,
        it_init=phase_iters)
    T[sel] = np.asarray(T2)[:ns]
    err[sel] = np.asarray(err2b)[:ns]
    return T, err


def prep_unique_batch(list_of_pts, list_of_nrm, n_min: int = 1,
                      rows_min: int = 8):
    """pad_batch over UNIQUE objects, with the row axis padded to a power
    of two (>= rows_min) so stages with different dynamic-object counts
    share one compiled indexed-ICP program. Padding rows are FAR points
    with empty masks — selectable only by invalid pairs, which start
    inactive."""
    import numpy as np
    pts, nrm, mask = pad_batch(list_of_pts, list_of_nrm, n_min=n_min)
    O, Np = mask.shape
    Op = max(1 << int(np.ceil(np.log2(max(O, 1)))), rows_min)
    if Op != O:
        from . import pallas_nn
        pts = np.concatenate(
            [pts, np.full((Op - O, Np, 3), pallas_nn.FAR, np.float32)])
        nrm = np.concatenate([nrm, np.zeros((Op - O, Np, 3), np.float32)])
        mask = np.concatenate([mask, np.zeros((Op - O, Np), bool)])
    return pts, nrm, mask


def pad_batch(list_of_pts, list_of_nrm, sort: bool = True, n_min: int = 1):
    """Pad a ragged list of (n_i, 3) arrays to (B, N_pad, 3) + mask.

    N_pad is the power of two covering the largest pair (>= one
    QUERY_BLOCK; >= n_min, which callers set to the largest DB object so
    DIFFERENT stages' batches share one compiled program — remote-tunnel
    XLA compiles cost 10-100x a launch). Each pair's points are
    Morton-sorted (tight kernel query blocks), padded replicate-last up to
    the next QUERY_BLOCK boundary (tight bbox for the one mixed block),
    then FAR beyond — whole far blocks skip the NN kernel's tile loop, so
    small pairs don't pay for the largest pair's point count.
    """
    import numpy as np

    B = len(list_of_pts)
    n_max = max([len(p) for p in list_of_pts] + [n_min, 1])
    n_pad = max(1 << int(np.ceil(np.log2(n_max))), 128)
    bq = pallas_nn.block_for(n_pad)
    n_pad = max(n_pad, bq)
    pts = np.full((B, n_pad, 3), pallas_nn.FAR, np.float32)
    nrm = np.zeros((B, n_pad, 3), np.float32)
    mask = np.zeros((B, n_pad), bool)
    for i, (p, n) in enumerate(zip(list_of_pts, list_of_nrm)):
        k = len(p)
        if sort and k:
            order = pallas_nn.morton_order(p)
            p = np.asarray(p, np.float32)[order]
            n = np.asarray(n, np.float32)[order]
        pts[i, :k] = p
        nrm[i, :k] = n
        mask[i, :k] = True
        edge = min(((k + bq - 1) // bq) * bq, n_pad)
        if k and edge > k:
            pts[i, k:edge] = p[k - 1]
            nrm[i, k:edge] = n[k - 1]
    return pts, nrm, mask
