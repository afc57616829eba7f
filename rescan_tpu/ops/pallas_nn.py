"""Pallas TPU kernel for gated nearest-neighbor search — the flagship
compute kernel of the framework.

Why Pallas: the XLA formulation of the dense search (ops/dense_nn.py)
materializes (queries x tile) distance matrices in HBM, so a coarse
grid-search pass moves ~100 GB of intermediates. Here the ENTIRE scene
level (positions, normals packed as an (8, N) f32 slab — ~10 MB for a
300k-point level-1 scene) sits in VMEM, each grid step processes one
query block, and the scene-tile loop runs entirely on-chip with a running
gated-min — zero HBM traffic for intermediates. Distances and normal dots
are VPU elementwise ops: a K=3 dot_general uses 3/128 of the MXU's
systolic depth and measured ~2x slower than plain f32 vector arithmetic.

Pruning: points are Morton-sorted (build_sorted_slab), so scene tiles are
spatially coherent. A vectorized bbox test over ALL tile bounds builds a
COMPACTED ascending near-tile list per query block in one fused XLA pass
(object-pose blocks touch ~1-2% of tiles); the kernel's tile loop visits
exactly those tiles via SMEM scalars — no per-tile bounds recheck or
lax.cond skip cost inside the kernel.
Query blocks are contiguous runs of one pose's object points; callers
Morton-sort the object points (morton_sort) so blocks are spatially
TIGHT, which shrinks each block's near-tile range.

Padding discipline (relied on by ops/score.py and ops/icp.py): queries
padded FAR away (>= 1e6) form blocks whose near-tile range is empty, so
whole-block padding costs only the block prologue (~18 us) instead of a
full tile loop — callers pad point counts with far sentinels aligned to
QUERY_BLOCK boundaries and never mix far sentinels into blocks that hold
real queries (a mixed block's bbox would cover the entire scene).

Semantics identical to dense_nn.nearest_gated_dense: strict d2 < r2,
gate max(dot,0) (or |dot|) >= cos - 1e-6, nearest qualifying neighbor,
original-order indices (via the sort permutation, applied by the caller).
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Kernel geometry, overridable for tuning sweeps (RESCAN_QUERY_BLOCK pins
# every call to one size). The round-3 sweep (tools/sweep_kernel_geometry,
# results in BASELINE.md) showed the optimum is WORKLOAD-DEPENDENT at
# SCENE_TILE=2048: small per-request point runs want small blocks (tight
# block bboxes -> fewer near tiles: 512-pt scoring 5.9 Mq/s at 128 vs 3.3
# at 512) while long runs want large blocks (8192-pt ICP queries 6.1 Mq/s
# at 512 vs 2.0 at 128). block_for() picks per call; QUERY_BLOCK is only
# the fallback/pin.
QUERY_BLOCK = int(os.environ.get("RESCAN_QUERY_BLOCK", 0)) or None
# RESCAN_SCENE_TILE pins EVERY index (sweeps); otherwise per-index ``tile``
# arguments may override the 2048 default (the sweep showed the ICP shape
# — long query runs vs the finer ICP-level scene — prefers (bq=128,
# tile=1024): 6.5-6.9 Mq/s vs 6.1 at (512, 2048)).
_ENV_TILE = int(os.environ.get("RESCAN_SCENE_TILE", 0)) or None
SCENE_TILE = _ENV_TILE or 2048
_DEFAULT_BLOCK = 256
# Sub-blocks per Pallas grid step. The round-5 roofline (ROOFLINE_r05.json)
# showed the scoring wall is grid-STEP-prologue-bound: ~18 us of fixed
# per-step cost x 400k query blocks ~= the whole 7.7 s scoring wall, with
# 77.5% of blocks pure FAR padding. One grid step therefore processes
# N_SUB consecutive bq-wide sub-blocks through an in-kernel fori_loop —
# per-sub-block bbox pruning, loop ranges, and reduction order are
# UNCHANGED (bit-identical results), but the fixed step cost is paid once
# per N_SUB blocks.
N_SUB = int(os.environ.get("RESCAN_SUB_BLOCKS", 0)) or 8


def block_for(n_run: int) -> int:
    """Query-block size for requests whose queries come in contiguous
    same-pose runs of ``n_run`` points (see the sweep note above)."""
    if QUERY_BLOCK:
        return QUERY_BLOCK
    if n_run <= 512:
        return 128
    if n_run <= 2048:
        return _DEFAULT_BLOCK
    return 512


def block_for_scoring(n_run: int) -> int:
    """Query-block size for the SCORING path (want_idx=False). Measured
    on the bench scoring grid (tile 2048), 4M-query launches, min-of-3:
    128-wide blocks win at EVERY run length — 512-pt runs 5.9 vs 4.3
    (256), 2048-pt runs 5.3 vs 4.5 (256), 8192-pt runs 6.7 vs 4.7 (512).
    The no-index kernel's small temporaries make narrow blocks free, and
    the tighter block bboxes prune more scene tiles. (The want_idx ICP
    path differs — see block_for/block_for_index.)"""
    if QUERY_BLOCK:
        return QUERY_BLOCK
    return 128


def block_for_index(index, n_run: int) -> int:
    """block_for, made aware of the index's tile size: a tile-1024 scene
    index pairs with 128-wide query blocks — the sweep's fastest ICP
    geometry (6.5-6.9 Mq/s vs 6.1 at (512, 2048)) — and the pairing is
    also a VMEM-safety requirement: the want_idx kernel's (bq x tile)
    intermediates share the 16 MB scoped-VMEM space with the whole scene
    slab, and (bq=512, tile=2048) OOMed the compiler on a 144-tile
    (295k-point) ICP-level scene."""
    if QUERY_BLOCK:
        return QUERY_BLOCK
    tile = getattr(index, "tile", None)
    if tile is not None and tile <= 1024:
        return 128
    return block_for(n_run)

# Far-sentinel coordinate for padding queries/points: far enough that no
# scene tile is ever "near", small enough that f32 squared norms stay
# finite.
FAR = 1e6


def morton_key(points: np.ndarray, cell: float) -> np.ndarray:
    """(N,) int64 Morton codes of points binned at ``cell``."""
    p = np.asarray(points, np.float32)
    n = len(p)
    c = np.floor(p / cell).astype(np.int64)
    if n:
        c -= c.min(axis=0)
    key = np.zeros(n, np.int64)
    for bit in range(16):
        for ax in range(3):
            key |= ((c[:, ax] >> bit) & 1) << (3 * bit + ax)
    return key


def morton_order(points: np.ndarray, cell: float = 0.2) -> np.ndarray:
    """Permutation sorting points along a Morton curve. Used to make
    QUERY_BLOCK-sized runs of object points spatially compact."""
    return np.argsort(morton_key(points, cell), kind="stable")


def _nn_kernel(rad_ref, gate_ref, q_ref, tlist_ref, cnt_ref, scene_ref,
               *out_refs, use_abs_dot: bool, want_idx: bool, n_tiles: int,
               bq: int, tile: int, n_sub: int):
    """N_SUB query sub-blocks vs their NEAR scene tiles, in one grid step.

    q_ref:     (8, bq * n_sub)   rows: x y z |q|^2 nx ny nz pad
    scene_ref: (8, N_pad)        rows: x y z |p|^2 nx ny nz pad
    tlist_ref: (n_sub, n_tiles) i32 in SMEM — per-SUB-BLOCK COMPACTED
        ascending list of near tile indices, precomputed vectorized in
        XLA by _run_kernel (entries past cnt are the sentinel n_tiles
        and never read)
    cnt_ref:   (n_sub, 1) i32 in SMEM — number of near tiles per
        sub-block (0 for FAR padding blocks: the tile loop is skipped
        entirely)
    outputs: (1, bq * n_sub) best [idx] / d2 / dot; the idx output (and
        its int32 carry) exists only when want_idx — the scoring path
        needs only (d2, dot) and skips the index epilogue.

    Why the prologue lives OUTSIDE the kernel: vector->scalar reductions
    (bbox mins/maxes, near-tile selection) cost ~1-2 us EACH on the VPU's
    scalar path, and with one 128-query block per reduction set they
    dominated the whole scoring wall (~18 us/block x 400k blocks,
    ROOFLINE_r05.json). XLA computes every block's near-tile list in one
    fused vectorized pass; the kernel reads it back as cheap SMEM
    scalars and visits EXACTLY the near tiles — no per-tile bounds
    recheck, no lax.cond skip cost (~0.4 us x ~16 skipped tiles per real
    block under the old [lo, hi) span loop). Results are bit-identical:
    skipped tiles contributed nothing to the carry, and the computed
    tiles keep their ascending order. Each bq-wide sub-block keeps its
    OWN tile list; the fori_loop over sub-blocks amortizes the fixed
    grid-step cost.
    """
    r2 = rad_ref[0]
    cos_gate = gate_ref[0]

    def sub_step(j, _):
        q = q_ref[:, pl.ds(j * bq, bq)]     # (8, BQ)
        # hoist the query-axis relayouts out of the tile loop: turning a
        # lane-major (BQ,) row into the (BQ, 1) sublane-major operand of
        # the outer-product broadcast is a relayout; done here it happens
        # once per sub-block instead of once per visited tile
        qx_c = q[0, :][:, None]
        qy_c = q[1, :][:, None]
        qz_c = q[2, :][:, None]
        qnx_c = q[4, :][:, None]
        qny_c = q[5, :][:, None]
        qnz_c = q[6, :][:, None]
        cnt = cnt_ref[j, 0]

        def tile_step(i, carry):
            t = tlist_ref[j, i]
            s = scene_ref[:, pl.ds(t * tile, tile)]           # (8, T)
            # VPU elementwise distances/dots: a K=3 contraction uses
            # 3/128 of the MXU's systolic depth, so dot_general (even
            # at HIGHEST precision) measured ~2x SLOWER than plain f32
            # vector ops — and (q - p)^2 is exactly the reference's
            # distance expression (no |q|^2 + |p|^2 - 2qp
            # cancellation).
            dx = qx_c - s[0, :][None, :]                      # (BQ, T)
            dy = qy_c - s[1, :][None, :]
            dz = qz_c - s[2, :][None, :]
            d2 = dx * dx + dy * dy + dz * dz
            ndot = (qnx_c * s[4, :][None, :]
                    + qny_c * s[5, :][None, :]
                    + qnz_c * s[6, :][None, :])
            gate = (jnp.abs(ndot) if use_abs_dot
                    else jnp.maximum(ndot, 0.0))
            ok = (d2 < r2) & (gate >= cos_gate - 1e-6)
            d2m = jnp.where(ok, d2, jnp.inf)
            tb = jnp.argmin(d2m, axis=1)                      # (BQ,)
            cols = jax.lax.broadcasted_iota(jnp.int32, d2m.shape, 1)
            sel = cols == tb[:, None]
            td2 = jnp.min(d2m, axis=1)
            tdot = jnp.max(jnp.where(sel, gate, -1.0), axis=1)
            if want_idx:
                best_d2, best_idx, best_dot = carry
                tidx = t * tile + tb
                better = td2 < best_d2
                return (jnp.where(better, td2, best_d2),
                        jnp.where(better, tidx, best_idx),
                        jnp.where(better, tdot, best_dot))
            best_d2, best_dot = carry
            better = td2 < best_d2
            return (jnp.where(better, td2, best_d2),
                    jnp.where(better, tdot, best_dot))

        if want_idx:
            init = (jnp.full((bq,), jnp.inf, jnp.float32),
                    jnp.full((bq,), -1, jnp.int32),
                    jnp.zeros((bq,), jnp.float32))
            best_d2, best_idx, best_dot = jax.lax.fori_loop(
                0, cnt, tile_step, init)
            found = best_d2 < jnp.inf
            out_refs[0][0, pl.ds(j * bq, bq)] = jnp.where(found, best_idx,
                                                          -1)
            out_refs[1][0, pl.ds(j * bq, bq)] = best_d2
            out_refs[2][0, pl.ds(j * bq, bq)] = best_dot
        else:
            init = (jnp.full((bq,), jnp.inf, jnp.float32),
                    jnp.zeros((bq,), jnp.float32))
            best_d2, best_dot = jax.lax.fori_loop(0, cnt, tile_step, init)
            out_refs[0][0, pl.ds(j * bq, bq)] = best_d2
            out_refs[1][0, pl.ds(j * bq, bq)] = best_dot
        return 0

    jax.lax.fori_loop(0, n_sub, sub_step, 0)


@jax.tree_util.register_pytree_node_class
class SortedSlab:
    """Scene packed for the Pallas kernels: cell-sorted (8, N_pad) slab,
    per-tile bounds, and the sort permutation to original indices."""

    def __init__(self, slab, tile_bounds, perm, n_valid, center,
                 n_tiles: int, tile: int = SCENE_TILE):
        self.slab = slab                # (8, N_pad) f32
        self.tile_bounds = tile_bounds  # (n_tiles, 8) f32
        self.perm = perm                # (N_pad,) original index of column
        self.n_valid = n_valid
        self.center = center            # (3,)
        self.n_tiles = n_tiles
        self.tile = tile                # points per tile (static)

    def tree_flatten(self):
        return ((self.slab, self.tile_bounds, self.perm, self.n_valid,
                 self.center), (self.n_tiles, self.tile))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, n_tiles=aux[0], tile=aux[1])


@jax.tree_util.register_pytree_node_class
class SlabSet:
    """A scene too large for ONE VMEM-resident slab, as Morton-contiguous
    parts. Each part is a SortedSlab whose ``perm`` already maps to
    ORIGINAL global indices, so per-part query results merge with a plain
    running min over d2 — semantics identical to a single slab (every
    point is in exactly one part). Costs one extra kernel launch per
    extra part; only scenes past RESCAN_MAX_SLAB_COLS (~12.6 MB of slab,
    ~390k points — near the 16 MB scoped-VMEM compile ceiling) pay it."""

    def __init__(self, slabs, n_total: int):
        self.slabs = slabs
        self.n_total = n_total

    @property
    def tile(self):
        return self.slabs[0].tile

    def tree_flatten(self):
        return (tuple(self.slabs), (self.n_total,))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(list(children), n_total=aux[0])


# slab columns per part before splitting; 393216 cols = 12.6 MB of slab,
# leaving scoped-VMEM headroom for the kernel's (bq x tile) temporaries
MAX_SLAB_COLS = int(os.environ.get("RESCAN_MAX_SLAB_COLS", 0)) or 393216


def build_sorted_slab(points: np.ndarray, normals: np.ndarray,
                      cell: float = 0.4,
                      tile_bucket: str = "m16",
                      tile: int = 0, orig_index=None):
    # env pin (sweeps) > per-index request > default
    tile = _ENV_TILE or tile or SCENE_TILE
    pts = np.asarray(points, np.float32)
    nrm = np.asarray(normals, np.float32)
    n = len(pts)
    if orig_index is None and n > int(MAX_SLAB_COLS * 0.94):
        # too big for one VMEM slab: global Morton sort, contiguous parts
        glob = np.argsort(morton_key(pts, cell), kind="stable")
        k = int(np.ceil(n / (MAX_SLAB_COLS * 0.94)))
        bounds = np.linspace(0, n, k + 1).astype(np.int64)
        slabs = [build_sorted_slab(pts[glob[a:b]], nrm[glob[a:b]],
                                   cell=cell, tile_bucket=tile_bucket,
                                   tile=tile,
                                   orig_index=glob[a:b].astype(np.int32))
                 for a, b in zip(bounds[:-1], bounds[1:])]
        return SlabSet(slabs, n_total=n)
    center = ((pts.min(0) + pts.max(0)) * 0.5 if n else np.zeros(3)).astype(np.float32)
    p = pts - center
    # sort columns along a Morton curve so every tile is compact in ALL
    # three axes (a row-major key would make tiles span the full x extent
    # and defeat the kernel's bbox pruning)
    order = np.argsort(morton_key(p, cell), kind="stable")
    p = p[order]
    nr = nrm[order]
    oidx = (order.astype(np.int32) if orig_index is None
            else np.asarray(orig_index, np.int32)[order])

    # bbox-limited tile segmentation, vectorized: a raw Morton chunking
    # leaves some tiles straddling octant jumps with huge bounds that no
    # query block ever prunes. Cut tiles at coarse-octant boundaries
    # (Morton cells of max_side/2) and every SCENE_TILE points within a
    # run; padding slots point far away and contribute +inf distances.
    max_side = 6.0
    segments = []
    if n:
        coarse = morton_key(p, max_side / 2.0)
        run_starts = np.concatenate(
            [[0], np.flatnonzero(coarse[1:] != coarse[:-1]) + 1, [n]])
        for a, b in zip(run_starts[:-1], run_starts[1:]):
            for s in range(a, b, tile):
                segments.append((s, min(s + tile, b)))
    else:
        segments = [(0, 0)]

    segments.append((n, n))  # trailing EMPTY sentinel tile (all padding)
    # bucket the tile count: distinct tile counts compile distinct kernels,
    # and the remote-tunnel XLA compile costs 10-100x the launch. Two
    # policies (empty tiles have far bounds -> skipped in the distance
    # loop, but every query block still SCANS all tile bounds, so padding
    # is not free):
    #   m16  — multiple of 16; scene-scale indexes, where the headline
    #          scoring/ICP kernels' per-block bounds scan makes +45% tile
    #          padding measurably slower (28.6 vs 24.9 s headline), and
    #          one scene means few variants anyway.
    #   pow2 — next power of two; per-MODEL indexes (label transfer,
    #          augment, parity tools), whose point counts grow every
    #          timestep and would otherwise churn a fresh compile per
    #          model per timestep.
    if tile_bucket == "pow2":
        n_bucket = max(16, 1 << int(np.ceil(np.log2(max(len(segments), 1)))))
        while len(segments) < n_bucket:
            segments.append((n, n))
    else:
        while len(segments) % 16:
            segments.append((n, n))
    n_tiles = len(segments)
    n_pad = n_tiles * tile
    slab = np.zeros((8, n_pad), np.float32)
    slab[0:3, :] = FAR
    slab[3, :] = 3e12
    perm = np.full(n_pad, -1, np.int32)
    tb = np.zeros((n_tiles, 8), np.float32)
    for t, (a, b) in enumerate(segments):
        k = b - a
        o = t * tile
        slab[0:3, o:o + k] = p[a:b].T
        slab[3, o:o + k] = (p[a:b] * p[a:b]).sum(1)
        slab[4:7, o:o + k] = nr[a:b].T
        perm[o:o + k] = oidx[a:b]
        if k:
            tb[t, 0:3] = p[a:b].min(0)
            tb[t, 4:7] = p[a:b].max(0)
        else:
            tb[t, 0:3] = FAR
            tb[t, 4:7] = FAR
    return SortedSlab(jnp.asarray(slab), jnp.asarray(tb), jnp.asarray(perm),
                      jnp.asarray(n, jnp.int32), jnp.asarray(center),
                      n_tiles, tile=tile)


def _run_kernel(slab: SortedSlab, q_pos, q_nrm, radius, cos_gate,
                use_abs_dot: bool, want_idx: bool, bq: int):
    m = q_pos.shape[0]
    # one grid step covers N_SUB bq-wide sub-blocks (prologue
    # amortization, see _nn_kernel); pad the query count to the
    # super-block so the grid divides evenly — the extra sub-blocks are
    # FAR padding whose near-tile range is empty
    sbq = bq * N_SUB
    mp = ((m + sbq - 1) // sbq) * sbq
    qc = q_pos - slab.center[None, :]
    qpad = jnp.full((mp, 3), 2 * FAR, qc.dtype).at[:m].set(qc)
    qnpad = jnp.zeros((mp, 3), q_nrm.dtype).at[:m].set(q_nrm)
    qslab = jnp.zeros((8, mp), jnp.float32)
    qslab = qslab.at[0:3, :].set(qpad.T)
    qslab = qslab.at[3, :].set(jnp.sum(qpad * qpad, axis=1))
    qslab = qslab.at[4:7, :].set(qnpad.T)

    n_blocks = mp // sbq
    rad2 = jnp.asarray([radius * radius], jnp.float32)
    cgate = jnp.asarray([cos_gate], jnp.float32)

    # per-sub-block prologue, vectorized in XLA for ALL blocks at once
    # (see _nn_kernel docstring): query bbox per bq-wide block, near-tile
    # mask against the tile bounds, COMPACTED ascending near-tile list
    # (sort moves the near tile indices to the front; the sentinel
    # n_tiles marks the never-read tail) and its count. Empty sentinel
    # tiles carry FAR bounds and are never near; FAR padding blocks get
    # cnt = 0 and skip the tile loop entirely.
    nbt = mp // bq
    q3 = qslab[0:3].reshape(3, nbt, bq)
    bmin = q3.min(axis=2)                                # (3, nbt)
    bmax = q3.max(axis=2)
    tb = slab.tile_bounds                                # (n_tiles, 8)
    radj = jnp.sqrt(rad2[0])
    near = ((tb[None, :, 0] <= bmax[0][:, None] + radj) &
            (tb[None, :, 4] >= bmin[0][:, None] - radj) &
            (tb[None, :, 1] <= bmax[1][:, None] + radj) &
            (tb[None, :, 5] >= bmin[1][:, None] - radj) &
            (tb[None, :, 2] <= bmax[2][:, None] + radj) &
            (tb[None, :, 6] >= bmin[2][:, None] - radj))  # (nbt, n_tiles)
    ii = jnp.arange(slab.n_tiles, dtype=jnp.int32)
    keys = jnp.where(near, ii[None, :], jnp.int32(slab.n_tiles))
    tlist = jnp.sort(keys, axis=1)                        # (nbt, n_tiles)
    cnt = near.sum(axis=1, dtype=jnp.int32)[:, None]      # (nbt, 1)

    kernel = functools.partial(_nn_kernel, use_abs_dot=use_abs_dot,
                               want_idx=want_idx, n_tiles=slab.n_tiles,
                               bq=bq, tile=slab.tile, n_sub=N_SUB)
    out_spec = pl.BlockSpec((1, sbq), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    out_specs = [out_spec] * (3 if want_idx else 2)
    out_shape = ([jax.ShapeDtypeStruct((1, mp), jnp.int32)] if want_idx
                 else [])
    out_shape += [jax.ShapeDtypeStruct((1, mp), jnp.float32),
                  jax.ShapeDtypeStruct((1, mp), jnp.float32)]
    outs = pl.pallas_call(
        kernel,
        interpret=jax.default_backend() == "cpu",
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                 # radius^2
            pl.BlockSpec(memory_space=pltpu.SMEM),                 # cos gate
            pl.BlockSpec((8, sbq), lambda i: (0, i),
                         memory_space=pltpu.VMEM),                 # queries
            pl.BlockSpec((N_SUB, slab.n_tiles), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),                 # tile list
            pl.BlockSpec((N_SUB, 1), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),                 # tile count
            pl.BlockSpec(memory_space=pltpu.VMEM),                 # scene slab
        ],
        out_specs=out_specs,
        out_shape=out_shape,
    )(rad2, cgate, qslab, tlist, cnt, slab.slab)
    return outs, m


@functools.partial(jax.jit, static_argnames=("use_abs_dot", "bq"))
def nearest_gated_pallas(slab: SortedSlab, q_pos: jax.Array,
                         q_nrm: jax.Array, radius, cos_gate,
                         use_abs_dot: bool = False, bq: int = 256
                         ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Gated 1-NN for M queries (M padded to the ``bq`` query block).

    Returns (idx, d2, dot) with idx in ORIGINAL point order (-1 if none).
    """
    (idx, d2, dot), m = _run_kernel(slab, q_pos, q_nrm, radius, cos_gate,
                                    use_abs_dot, want_idx=True, bq=bq)
    idx = idx[0, :m]
    d2 = d2[0, :m]
    dot = dot[0, :m]
    # sorted-column index -> original index
    safe = jnp.maximum(idx, 0)
    oidx = jnp.where(idx >= 0, slab.perm[safe], -1)
    return oidx, d2, dot


@functools.partial(jax.jit, static_argnames=("use_abs_dot", "bq"))
def gated_min_pallas(slab: SortedSlab, q_pos: jax.Array, q_nrm: jax.Array,
                     radius, cos_gate, use_abs_dot: bool = False,
                     bq: int = 256) -> Tuple[jax.Array, jax.Array]:
    """(d2, dot) of the nearest in-radius gate-passing neighbor, without
    index tracking — the scoring path's kernel (drops the int32 carry, the
    index epilogue, and the HBM permutation gather). d2 == +inf where no
    neighbor qualifies."""
    (d2, dot), m = _run_kernel(slab, q_pos, q_nrm, radius, cos_gate,
                               use_abs_dot, want_idx=False, bq=bq)
    return d2[0, :m], dot[0, :m]


def nearest_gated_set(sset: SlabSet, q_pos, q_nrm, radius, cos_gate,
                      use_abs_dot: bool = False, bq: int = 256):
    """nearest_gated_pallas over a SlabSet: per-part kernels merged by a
    running min over d2 (misses carry d2=+inf, so the merge is exact)."""
    idx = d2 = dot = None
    for s in sset.slabs:
        i, d, t = nearest_gated_pallas(s, q_pos, q_nrm, radius, cos_gate,
                                       use_abs_dot=use_abs_dot, bq=bq)
        if idx is None:
            idx, d2, dot = i, d, t
        else:
            better = d < d2
            idx = jnp.where(better, i, idx)
            dot = jnp.where(better, t, dot)
            d2 = jnp.minimum(d2, d)
    return idx, d2, dot


def gated_min_set(sset: SlabSet, q_pos, q_nrm, radius, cos_gate,
                  use_abs_dot: bool = False, bq: int = 256):
    """gated_min_pallas over a SlabSet (scoring path, no index carry)."""
    d2 = dot = None
    for s in sset.slabs:
        d, t = gated_min_pallas(s, q_pos, q_nrm, radius, cos_gate,
                                use_abs_dot=use_abs_dot, bq=bq)
        if d2 is None:
            d2, dot = d, t
        else:
            better = d < d2
            dot = jnp.where(better, t, dot)
            d2 = jnp.minimum(d2, d)
    return d2, dot
