"""Unified spatial-index dispatch.

Two interchangeable engines implement the gated nearest-neighbor query:

* ``DenseIndex`` (ops/dense_nn.py) — MXU matmul distance tiles; the right
  engine on TPU, where gathers are scalar-bound.
* ``HashGrid``  (ops/hashgrid.py)  — windowed candidate gathers; the right
  engine on CPU (tests) and for huge scenes where dense tiles would waste
  too many FLOPs.

``build_index`` picks by backend unless told otherwise; all hot kernels
(scoring, ICP) go through ``nearest_gated`` here.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from . import dense_nn, hashgrid, pallas_nn

Index = Union[pallas_nn.SortedSlab, pallas_nn.SlabSet, dense_nn.DenseIndex,
              hashgrid.HashGrid]


def build_index(points: np.ndarray, cell: float,
                normals: Optional[np.ndarray] = None,
                prefer_dense: Optional[bool] = None,
                tile_bucket: str = "m16", tile: int = 0) -> Index:
    """``cell`` is the query radius the index should serve (used by the
    grid engine; ignored by the dense ones). ``tile_bucket='pow2'`` is for
    per-model indexes whose sizes churn across timesteps; ``tile``
    overrides the scene-tile size for this index (see
    pallas_nn.build_sorted_slab)."""
    if prefer_dense is None:
        prefer_dense = jax.default_backend() != "cpu"
    if prefer_dense:
        nrm = (np.zeros_like(np.asarray(points, np.float32))
               if normals is None else normals)
        return pallas_nn.build_sorted_slab(points, nrm,
                                           tile_bucket=tile_bucket,
                                           tile=tile)
    return hashgrid.build_grid(points, cell, normals=normals)


def nearest_gated(index: Index, q_pos, q_nrm, radius, cos_gate,
                  use_abs_dot: bool = False, chunk: int = 4096,
                  bq: int = 256):
    """(idx, d2, dot) of the nearest in-radius neighbor passing the normal
    gate; idx in ORIGINAL point order, -1 where none qualifies. ``bq``:
    Pallas query-block size — callers pass pallas_nn.block_for(run length)
    (other engines ignore it)."""
    if isinstance(index, pallas_nn.SortedSlab):
        return pallas_nn.nearest_gated_pallas(index, q_pos, q_nrm, radius,
                                              cos_gate,
                                              use_abs_dot=use_abs_dot,
                                              bq=bq)
    if isinstance(index, pallas_nn.SlabSet):
        return pallas_nn.nearest_gated_set(index, q_pos, q_nrm, radius,
                                           cos_gate, use_abs_dot=use_abs_dot,
                                           bq=bq)
    if isinstance(index, dense_nn.DenseIndex):
        return dense_nn.nearest_gated_dense(index, q_pos, q_nrm, radius,
                                            cos_gate, use_abs_dot=use_abs_dot,
                                            chunk=chunk)
    return hashgrid.nearest_gated(index, q_pos, q_nrm, radius, cos_gate,
                                  use_abs_dot=use_abs_dot,
                                  chunk=min(chunk, 2048))


def gated_min(index: Index, q_pos, q_nrm, radius, cos_gate,
              use_abs_dot: bool = False, chunk: int = 4096, bq: int = 256):
    """(d2, dot, found) of the nearest in-radius gate-passing neighbor —
    the scoring path's query: no neighbor INDEX is tracked, which lets the
    Pallas kernel drop its int32 carry and the permutation gather."""
    if isinstance(index, pallas_nn.SortedSlab):
        d2, dot = pallas_nn.gated_min_pallas(index, q_pos, q_nrm, radius,
                                             cos_gate,
                                             use_abs_dot=use_abs_dot,
                                             bq=bq)
        return d2, dot, jnp.isfinite(d2)
    if isinstance(index, pallas_nn.SlabSet):
        d2, dot = pallas_nn.gated_min_set(index, q_pos, q_nrm, radius,
                                          cos_gate, use_abs_dot=use_abs_dot,
                                          bq=bq)
        return d2, dot, jnp.isfinite(d2)
    idx, d2, dot = nearest_gated(index, q_pos, q_nrm, radius, cos_gate,
                                 use_abs_dot=use_abs_dot, chunk=chunk)
    return d2, dot, idx >= 0


def index_arrays(index: Index) -> Tuple[jax.Array, jax.Array]:
    """(points, normals) in original order, for correspondence gathers."""
    if isinstance(index, pallas_nn.SlabSet):
        # scatter each Morton part back to its original rows; padding
        # columns (perm == -1) target a throwaway row past the end
        n = max(index.n_total, 1)
        out_p = jnp.zeros((n + 1, 3), jnp.float32)
        out_n = jnp.zeros((n + 1, 3), jnp.float32)
        for s_ in index.slabs:
            pts = s_.slab[0:3, :].T + s_.center[None, :]
            nrm = s_.slab[4:7, :].T
            tgt = jnp.where(s_.perm >= 0, s_.perm, n)
            out_p = out_p.at[tgt].set(pts)
            out_n = out_n.at[tgt].set(nrm)
        return out_p[:n], out_n[:n]
    if isinstance(index, pallas_nn.SortedSlab):
        n_pad = index.slab.shape[1]
        pts = index.slab[0:3, :].T + index.center[None, :]
        nrm = index.slab[4:7, :].T
        # padding columns (perm == -1) scatter to the last row, which is
        # unused whenever padding exists at all
        safe = jnp.where(index.perm >= 0, index.perm, n_pad - 1)
        out_p = jnp.zeros((n_pad, 3), pts.dtype).at[safe].set(pts)
        out_n = jnp.zeros((n_pad, 3), nrm.dtype).at[safe].set(nrm)
        return out_p, out_n
    if isinstance(index, dense_nn.DenseIndex):
        return (index.points + index.center[None, :], index.normals)
    inv = jnp.zeros_like(index.perm).at[index.perm].set(
        jnp.arange(index.perm.shape[0], dtype=index.perm.dtype))
    return index.points[inv], index.normals[inv]
