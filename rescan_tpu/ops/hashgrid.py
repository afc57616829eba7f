"""Device-side fixed-shape neighbor search — the framework's spatial engine.

This replaces the reference's ``msh_hash_grid`` (lib/msh/msh_hash_grid.h),
whose ragged, pointer-chasing queries cannot run on TPU. The TPU-native
design (SURVEY.md §7.1):

* Points are bucketed into a dense uniform grid with cell size == the query
  radius and sorted by cell id (host-side prep, cheap vs. queries).
  Cell ids are ``(cy*nz + cz)*nx + cx`` so the 3 x-adjacent cells of a
  query are one contiguous range of the sorted array — each query reads
  9 contiguous ranges (3x3 in y,z) of bounded length.
* Every query gathers a fixed ``9 x L`` candidate window (L = 3 x max
  points/cell, padded), computes all distances at once, and reduces — no
  data-dependent shapes anywhere, everything vmappable and jittable.
* Semantics match the reference exactly where it matters: strict
  ``d^2 < r^2`` inclusion (msh_hash_grid.h:857) and capped results keep
  the k closest (max-heap storage, msh_hash_grid.h:828-860).

Two primitives cover every consumer in the pipeline:

* ``nearest_gated`` — nearest in-radius neighbor passing a normal-angle
  gate (scoring, ICP correspondences, label transfer): returns
  (idx, d2, dot) without materializing neighbor lists.
* ``radius_knn``    — fixed-K sorted neighbor lists (smoothing edges,
  connected components, saliency).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
class HashGrid:
    """Static-shape device grid. ``cell``, ``dims`` and ``cap`` are static
    Python values (pytree aux data) so compiled query shapes are static;
    the arrays are pytree leaves living on device."""

    def __init__(self, points, normals, perm, cell_start, origin,
                 cell: float, dims: Tuple[int, int, int], cap: int):
        self.points = points          # (N, 3) sorted by cell id
        self.normals = normals        # (N, 3) sorted (zeros if absent)
        self.perm = perm              # (N,) original index of sorted points
        self.cell_start = cell_start  # (n_cells + 1,) prefix offsets
        self.origin = origin          # (3,)
        self.cell = cell
        self.dims = dims
        self.cap = cap

    def tree_flatten(self):
        return ((self.points, self.normals, self.perm, self.cell_start,
                 self.origin), (self.cell, self.dims, self.cap))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


def build_grid(points: np.ndarray, cell: float,
               normals: Optional[np.ndarray] = None,
               cap: Optional[int] = None) -> HashGrid:
    """Host-side build: bucket, sort, prefix-sum. ``points`` is (N,3)."""
    pts = np.asarray(points, dtype=np.float32)
    n = len(pts)
    mn = pts.min(axis=0) if n else np.zeros(3, np.float32)
    mx = pts.max(axis=0) if n else np.zeros(3, np.float32)
    inv = 1.0 / cell
    dims = tuple(int(np.floor((mx[k] - mn[k]) * inv)) + 1 for k in range(3))
    cx = np.clip(((pts[:, 0] - mn[0]) * inv).astype(np.int64), 0, dims[0] - 1)
    cy = np.clip(((pts[:, 1] - mn[1]) * inv).astype(np.int64), 0, dims[1] - 1)
    cz = np.clip(((pts[:, 2] - mn[2]) * inv).astype(np.int64), 0, dims[2] - 1)
    cid = (cy * dims[2] + cz) * dims[0] + cx
    order = np.argsort(cid, kind="stable").astype(np.int32)
    cid_sorted = cid[order]
    n_cells = dims[0] * dims[1] * dims[2]
    counts = np.bincount(cid_sorted, minlength=n_cells)
    cell_start = np.zeros(n_cells + 1, dtype=np.int32)
    np.cumsum(counts, out=cell_start[1:])
    real_cap = int(counts.max()) if n else 1
    if cap is None:
        cap = max(real_cap, 1)
    nrm = (np.zeros_like(pts) if normals is None
           else np.asarray(normals, dtype=np.float32))
    return HashGrid(
        points=jnp.asarray(pts[order]),
        normals=jnp.asarray(nrm[order]),
        perm=jnp.asarray(order),
        cell_start=jnp.asarray(cell_start),
        origin=jnp.asarray(mn),
        cell=float(cell),
        dims=dims,
        cap=int(cap),
    )


def _candidate_ranges(grid: HashGrid, q: jax.Array):
    """For queries (M,3): start offsets (M,9) and base cell coords.

    Each of the 9 (dy, dz) combinations selects a contiguous range of
    3 x-adjacent cells in the sorted point array.
    """
    inv = 1.0 / grid.cell
    nx, ny, nz = grid.dims
    c = jnp.floor((q - grid.origin[None, :]) * inv).astype(jnp.int32)
    cx = jnp.clip(c[:, 0], 0, nx - 1)
    cy = c[:, 1]
    cz = c[:, 2]
    starts = []
    lens = []
    for dy in (-1, 0, 1):
        yy = cy + dy
        y_ok = (yy >= 0) & (yy < ny)
        yy = jnp.clip(yy, 0, ny - 1)
        for dz in (-1, 0, 1):
            zz = cz + dz
            z_ok = (zz >= 0) & (zz < nz)
            zz = jnp.clip(zz, 0, nz - 1)
            x_lo = jnp.maximum(cx - 1, 0)
            x_hi = jnp.minimum(cx + 1, nx - 1)
            row = (yy * nz + zz) * nx
            s = grid.cell_start[row + x_lo]
            e = grid.cell_start[row + x_hi + 1]
            ok = y_ok & z_ok
            starts.append(jnp.where(ok, s, 0))
            lens.append(jnp.where(ok, e - s, 0))
    return jnp.stack(starts, axis=1), jnp.stack(lens, axis=1)  # (M, 9)


def _candidate_window(grid: HashGrid, q: jax.Array):
    """Gather the (M, 9*L) candidate indices + validity for queries q."""
    L = 3 * grid.cap
    starts, lens = _candidate_ranges(grid, q)            # (M, 9)
    offs = jnp.arange(L, dtype=jnp.int32)                # (L,)
    idx = starts[:, :, None] + offs[None, None, :]       # (M, 9, L)
    valid = offs[None, None, :] < lens[:, :, None]
    idx = jnp.where(valid, idx, 0)
    m = q.shape[0]
    return idx.reshape(m, 9 * L), valid.reshape(m, 9 * L)


def _chunked(fn, q, *extra, chunk: int):
    """Apply fn over row-chunks of q to bound transient memory."""
    m = q.shape[0]
    if m <= chunk:
        return fn(q, *extra)
    pad = (-m) % chunk
    qp = jnp.pad(q, ((0, pad), (0, 0)))
    extras = [jnp.pad(e, ((0, pad),) + ((0, 0),) * (e.ndim - 1)) for e in extra]
    blocks = qp.reshape(-1, chunk, q.shape[1])
    eblocks = [e.reshape(-1, chunk, *e.shape[1:]) for e in extras]
    out = jax.lax.map(lambda args: fn(args[0], *args[1:]),
                      (blocks, *eblocks))
    out = jax.tree_util.tree_map(
        lambda x: x.reshape(-1, *x.shape[2:])[:m], out)
    return out


@functools.partial(jax.jit, static_argnames=("use_abs_dot", "chunk"))
def nearest_gated(grid: HashGrid, q_pos: jax.Array, q_nrm: jax.Array,
                  radius, cos_gate, use_abs_dot: bool = False,
                  chunk: int = 4096):
    """Nearest neighbor with d2 < radius^2 whose normal passes the gate.

    Gate: dot(q_nrm, p_nrm) (clamped at 0, or |dot| when use_abs_dot)
    must satisfy ``acos(dot) <= max_angle``, i.e. ``dot >= cos_gate``;
    a tiny tolerance matches the reference's ``angle - max_angle < 1e-6``
    acceptance (pose_proposal.cpp:141).

    Returns (idx, d2, dot): idx is -1 where no neighbor qualifies; idx
    refers to the ORIGINAL (unsorted) point order.
    """
    def one_chunk(q, qn):
        cand, valid = _candidate_window(grid, q)          # (m, K)
        p = grid.points[cand]                             # (m, K, 3)
        nrm = grid.normals[cand]                          # (m, K, 3)
        d = p - q[:, None, :]
        d2 = jnp.sum(d * d, axis=-1)
        dot = jnp.sum(nrm * qn[:, None, :], axis=-1)
        gate_dot = jnp.abs(dot) if use_abs_dot else jnp.maximum(dot, 0.0)
        ok = valid & (d2 < radius * radius) & (gate_dot >= cos_gate - 1e-6)
        d2m = jnp.where(ok, d2, jnp.inf)
        best = jnp.argmin(d2m, axis=1)
        rows = jnp.arange(q.shape[0])
        found = jnp.isfinite(d2m[rows, best])
        bidx = jnp.where(found, grid.perm[cand[rows, best]], -1)
        return (bidx.astype(jnp.int32), jnp.where(found, d2[rows, best], jnp.inf),
                jnp.where(found, gate_dot[rows, best], 0.0))

    return _chunked(one_chunk, q_pos, q_nrm, chunk=chunk)


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def radius_knn(grid: HashGrid, q_pos: jax.Array, radius, k: int,
               chunk: int = 4096):
    """K nearest neighbors with d2 < radius^2, sorted ascending.

    Returns (idx, d2, count): idx (M, k) into original order, -1 padded;
    matches msh_hash_grid_radius_search with sort=1 + max_n_neigh=k.
    """
    def one_chunk(q):
        cand, valid = _candidate_window(grid, q)
        p = grid.points[cand]
        d = p - q[:, None, :]
        d2 = jnp.sum(d * d, axis=-1)
        ok = valid & (d2 < radius * radius)
        d2m = jnp.where(ok, d2, jnp.inf)
        # top-k smallest
        neg, pos_idx = jax.lax.top_k(-d2m, k)
        kd2 = -neg
        found = jnp.isfinite(kd2)
        rows = jnp.arange(q.shape[0])[:, None]
        kidx = jnp.where(found, grid.perm[cand[rows, pos_idx]], -1)
        return (kidx.astype(jnp.int32), jnp.where(found, kd2, jnp.inf),
                jnp.sum(found, axis=1).astype(jnp.int32))

    return _chunked(one_chunk, q_pos, chunk=chunk)
