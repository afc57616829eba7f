"""Dense MXU nearest-neighbor search — the TPU-native spatial engine.

TPU gathers are scalar-bound and the windowed hash-grid search
(ops/hashgrid.py) issues hundreds of them per query; on the systolic array
the winning formulation is DENSE: squared distances via the matmul
expansion |q - p|^2 = |q|^2 + |p|^2 - 2 q.p and normal dots via a second
matmul, evaluated scene-TILE by scene-tile with a running (min-d2, idx,
dot) carry — the same blockwise discipline as flash attention, with a
gated min instead of a softmax (SURVEY.md §7.1's "tiled brute-force
pairwise distance" design point).

A level-1 scene (~300k points) is ~3.6 MB of positions — the whole tile
stream stays resident while query chunks flow through the MXU. Everything
is f32 matmuls with HIGHEST precision on positions (bf16 would cost ~16 mm
at room scale); coordinates are centered to keep the expansion's
cancellation error ~1e-6 on d^2.

Semantics match ops.hashgrid.nearest_gated exactly: strict d2 < r2,
gate acos(max(dot,0)) <= angle (or |dot|), nearest passing neighbor wins;
returned indices are original point order.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
class DenseIndex:
    """Padded point set for dense search. ``n_pad``/``tile`` are static."""

    def __init__(self, points, normals, n_valid, center,
                 tile: int = 2048):
        self.points = points      # (n_pad, 3) centered, padded rows pushed far away
        self.normals = normals    # (n_pad, 3)
        self.n_valid = n_valid    # () int32
        self.center = center      # (3,) the subtracted center
        self.tile = tile

    def tree_flatten(self):
        return ((self.points, self.normals, self.n_valid, self.center),
                (self.tile,))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, tile=aux[0])


def build_dense_index(points: np.ndarray, normals: Optional[np.ndarray] = None,
                      tile: int = 2048) -> DenseIndex:
    pts = np.asarray(points, dtype=np.float32)
    n = len(pts)
    center = (pts.min(axis=0) + pts.max(axis=0)) * 0.5 if n else np.zeros(3)
    n_pad = max(((n + tile - 1) // tile) * tile, tile)
    p = np.full((n_pad, 3), 1e6, dtype=np.float32)   # padding is far away
    p[:n] = pts - center.astype(np.float32)
    nr = np.zeros((n_pad, 3), dtype=np.float32)
    if normals is not None:
        nr[:n] = np.asarray(normals, dtype=np.float32)
    return DenseIndex(jnp.asarray(p), jnp.asarray(nr),
                      jnp.asarray(n, jnp.int32),
                      jnp.asarray(center, jnp.float32), tile=tile)


@functools.partial(jax.jit, static_argnames=("use_abs_dot",))
def _nearest_chunk(index: DenseIndex, qb: jax.Array, qnb: jax.Array,
                   radius, cos_gate, use_abs_dot: bool = False
                   ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One fixed-size query chunk against all scene tiles (a lax.scan with
    a running gated min). This single compiled program serves EVERY dense
    query in the pipeline for a given scene index — queries are pre-centered
    and chunk shape is fixed by the caller."""
    tile = index.tile
    n_tiles = index.points.shape[0] // tile
    c = qb.shape[0]
    r2 = radius * radius
    p2_all = jnp.sum(index.points * index.points, axis=1)      # (n_pad,)
    q2 = jnp.sum(qb * qb, axis=1)                              # (c,)

    def body(carry, t):
        best_d2, best_idx, best_dot = carry
        sl = jax.lax.dynamic_slice_in_dim(index.points, t * tile, tile)
        nl = jax.lax.dynamic_slice_in_dim(index.normals, t * tile, tile)
        p2 = jax.lax.dynamic_slice_in_dim(p2_all, t * tile, tile)
        cross = jax.lax.dot_general(
            qb, sl, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST)                # (c, tile)
        d2 = q2[:, None] + p2[None, :] - 2.0 * cross
        d2 = jnp.maximum(d2, 0.0)
        dots = jax.lax.dot_general(
            qnb, nl, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST)
        gate = jnp.abs(dots) if use_abs_dot else jnp.maximum(dots, 0.0)
        ids = t * tile + jax.lax.broadcasted_iota(jnp.int32, (c, tile), 1)
        ok = ((d2 < r2) & (gate >= cos_gate - 1e-6)
              & (ids < index.n_valid))
        d2m = jnp.where(ok, d2, jnp.inf)
        tbest = jnp.argmin(d2m, axis=1)
        rows = jnp.arange(c)
        td2 = d2m[rows, tbest]
        tidx = ids[rows, tbest]
        tdot = gate[rows, tbest]
        better = td2 < best_d2
        return ((jnp.where(better, td2, best_d2),
                 jnp.where(better, tidx, best_idx),
                 jnp.where(better, tdot, best_dot)), None)

    init = (jnp.full((c,), jnp.inf),
            jnp.full((c,), -1, jnp.int32),
            jnp.zeros((c,)))
    (bd2, bidx, bdot), _ = jax.lax.scan(body, init, jnp.arange(n_tiles))
    found = jnp.isfinite(bd2)
    return (jnp.where(found, bidx, -1), bd2, bdot)


def nearest_gated_dense(index: DenseIndex, q_pos, q_nrm,
                        radius, cos_gate, use_abs_dot: bool = False,
                        chunk: int = 32768
                        ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Nearest in-radius neighbor passing the normal gate, densely.

    Host-driven chunk dispatch: every chunk is the SAME compiled shape
    ((chunk, 3) queries), so one compilation serves arbitrarily large query
    streams, and JAX's async dispatch pipelines chunks back to back. This
    deliberately avoids device-side lax.map over chunks — long trip counts
    destabilize this image's remote-compile TPU worker.

    Returns (idx, d2, dot); idx -1 where nothing qualifies.
    May be called inside jit ONLY with m <= chunk (single-chunk path).
    """
    qc = q_pos - index.center[None, :]
    m = q_pos.shape[0]
    if m <= chunk:
        return _nearest_chunk(index, qc, q_nrm, radius, cos_gate,
                              use_abs_dot=use_abs_dot)
    pad = (-m) % chunk
    qp = jnp.pad(qc, ((0, pad), (0, 0)))
    qnp_ = jnp.pad(q_nrm, ((0, pad), (0, 0)))
    outs = []
    for i in range(0, m + pad, chunk):
        outs.append(_nearest_chunk(index, qp[i:i + chunk],
                                   qnp_[i:i + chunk], radius, cos_gate,
                                   use_abs_dot=use_abs_dot))
    idx = jnp.concatenate([o[0] for o in outs])[:m]
    d2 = jnp.concatenate([o[1] for o in outs])[:m]
    dot = jnp.concatenate([o[2] for o in outs])[:m]
    return idx, d2, dot
