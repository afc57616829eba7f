"""Batched pose-hypothesis alignment scoring — hot loop #1 of the pipeline.

The reference scores one (object, pose) at a time with OpenMP radius
searches (mgs_compute_object_alignment_score,
apps/pose_proposal/pose_proposal.cpp:93-158) inside a triple host loop over
(grid cell x, grid cell z, angle) (mgs__initial_pose_proposals, :170-254).
Here ALL hypotheses of an object are scored in one device launch: transform
(H, P, 3) points, run the fused gated nearest-neighbor search against the
scene level-1 grid, reduce per-hypothesis.

Per-point score (pose_proposal.cpp:127-156): for the nearest in-radius scene
point whose normal passes the 35-degree gate,

    score = 0.05 * exp(-angle^2 / (2 * 0.5^2)) + 0.95 * exp(-d^2 / (2 * sigma^2))

with radius = sigma = 0.1 (search_radii[search_lvl=1], :98-101); unmatched
points contribute 0; the hypothesis score is the mean over all object
points at the query level.

Known deviation from the reference: the reference caps its radius search at
the 64 nearest neighbors (:179), so a point whose 64 nearest scene points
all fail the normal gate scores 0 even when a farther in-radius point would
pass; we search the full radius. This inflates scores slightly at surface
boundaries; parity is gated on pipeline metrics (mAP), not on score bits.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import config
from . import search


@functools.partial(jax.jit, static_argnames=("chunk",))
def score_hypotheses(grid, obj_pts: jax.Array,
                     obj_nrm: jax.Array, obj_mask: jax.Array,
                     hyps: jax.Array, radius, sigma,
                     chunk: int = 2048) -> jax.Array:
    """Score H pose hypotheses for one object.

    Args:
      grid: scene search index (level 1, normals attached) — either a
        HashGrid or a DenseIndex (ops/search.py).
      obj_pts/obj_nrm: (P, 3) object points at the query level (padded).
      obj_mask: (P,) validity mask.
      hyps: (H, 4, 4) hypothesis transforms.
      radius/sigma: search radius and distance sigma (both 0.1 in the
        pipeline; they equal search_radii[search_lvl]).

    Returns: (H,) scores.
    """
    H = hyps.shape[0]
    P = obj_pts.shape[0]
    R = hyps[:, :3, :3]
    t = hyps[:, :3, 3]
    q = jnp.einsum("hij,pj->hpi", R, obj_pts) + t[:, None, :]
    qn = jnp.einsum("hij,pj->hpi", R, obj_nrm)

    cos_gate = jnp.cos(jnp.deg2rad(config.SCORE_MAX_ANGLE_DEG))
    idx, d2, dot = search.nearest_gated(
        grid, q.reshape(H * P, 3), qn.reshape(H * P, 3), radius, cos_gate,
        chunk=chunk)
    found = (idx >= 0).reshape(H, P) & obj_mask[None, :]
    d2 = d2.reshape(H, P)
    dot = jnp.clip(dot.reshape(H, P), 0.0, 1.0)

    angle = jnp.arccos(dot)
    normals_compat = jnp.exp(-(angle * angle) /
                             (2.0 * config.SCORE_NORMAL_SIGMA ** 2))
    dist_compat = jnp.exp(-d2 / (2.0 * sigma * sigma))
    per_pt = (config.SCORE_ALPHA * normals_compat
              + (1.0 - config.SCORE_ALPHA) * dist_compat)
    per_pt = jnp.where(found, per_pt, 0.0)
    n = jnp.maximum(jnp.sum(obj_mask), 1)
    return jnp.sum(per_pt, axis=1) / n


# Launch sizing: each launch is ONE fixed-shape query chunk (the tunnel's
# remote-compile worker is destabilized by device-side chunk loops), so
# hypothesis slices satisfy H_slice * P_pad <= MAX_QUERIES_PER_LAUNCH and
# JAX async dispatch pipelines the slice stream. Sized large (1M queries,
# ~4096 Pallas grid steps) because under the axon tunnel EVERY launch pays
# a ~50 ms host round trip regardless of device time — measured 57 ms/launch
# at 32768 queries vs <1 ms of kernel time.
MAX_QUERIES_PER_LAUNCH = 1 << 20


def score_hypotheses_slab(slab, obj_pts: np.ndarray, obj_nrm: np.ndarray,
                          hyps: np.ndarray, radius, sigma) -> np.ndarray:
    """Fast TPU scoring path: hypotheses are host-known, so queries and
    per-query-block NEAR-TILE LISTS are computed on the host and the
    scalar-prefetch Pallas kernel touches exactly the scene tiles each
    block needs — no scanned/skipped iterations at all."""
    from . import pallas_nn

    p = len(obj_pts)
    pp = 1 << max(int(np.ceil(np.log2(max(p, 1)))), 0)
    bq = pallas_nn.QUERY_BLOCK
    h_slice = max(MAX_QUERIES_PER_LAUNCH // pp, 1)
    pts_p = np.zeros((pp, 3), np.float32)
    pts_p[:p] = obj_pts
    nrm_p = np.zeros((pp, 3), np.float32)
    nrm_p[:p] = obj_nrm
    center = np.asarray(slab.center)
    cos_gate = float(np.cos(np.deg2rad(config.SCORE_MAX_ANGLE_DEG)))
    valid_col = np.zeros(pp, bool)
    valid_col[:p] = True

    h = len(hyps)
    out = np.empty(h, np.float32)
    pending = []
    for lo in range(0, max(h, 1), h_slice):
        sl = hyps[lo:lo + h_slice]
        mats = np.tile(np.eye(4, dtype=np.float32), (h_slice, 1, 1))
        mats[:len(sl)] = sl
        R = mats[:, :3, :3]
        t = mats[:, :3, 3]
        q = (np.einsum("hij,pj->hpi", R, pts_p) + t[:, None, :]
             - center[None, None, :]).astype(np.float32)
        qn = np.einsum("hij,pj->hpi", R, nrm_p).astype(np.float32)
        m = h_slice * pp
        qf = q.reshape(m, 3)
        qslab = np.zeros((8, m), np.float32)
        qslab[0:3] = qf.T
        qslab[3] = (qf * qf).sum(1)
        qslab[4:7] = qn.reshape(m, 3).T
        # per-block bounds over VALID columns only (padding points sit at
        # the hypothesis origin and would inflate the block bbox)
        vmask = np.tile(valid_col, h_slice)
        big = np.float32(1e9)
        qv = np.where(vmask[:, None], qf, big)
        bmin = qv.reshape(-1, bq, 3).min(axis=1)
        qv = np.where(vmask[:, None], qf, -big)
        bmax = qv.reshape(-1, bq, 3).max(axis=1)
        tl = pallas_nn.block_near_tiles(
            slab, np.concatenate([bmin, bmax], axis=1), float(radius))
        idx, d2, dot = pallas_nn.nearest_gated_hostlist(
            slab, qslab, tl, float(radius), cos_gate)
        pending.append((lo, len(sl), idx, d2, dot, vmask))

    for lo, n_sl, idx, d2, dot, vmask in pending:
        idx = np.asarray(idx)
        d2 = np.asarray(d2)
        dot = np.clip(np.asarray(dot), 0.0, 1.0)
        found = (idx >= 0) & vmask
        ang = np.arccos(dot)
        contrib = (config.SCORE_ALPHA
                   * np.exp(-(ang * ang) / (2 * config.SCORE_NORMAL_SIGMA ** 2))
                   + (1 - config.SCORE_ALPHA) * np.exp(-d2 / (2 * sigma * sigma)))
        contrib = np.where(found, contrib, 0.0)
        s = contrib.reshape(-1, pp).sum(axis=1) / max(p, 1)
        out[lo:lo + n_sl] = s[:n_sl]
    return out


def score_hypotheses_bucketed(grid, obj_pts: np.ndarray,
                              obj_nrm: np.ndarray, hyps: np.ndarray,
                              radius, sigma, chunk: int = 2048) -> np.ndarray:
    """Host wrapper: pad points to pow2 and slice hypotheses so each launch
    is one fixed-shape query chunk; compiled kernels are reused across
    objects/levels/stages. Returns (H,) scores."""
    import jax.numpy as jnp
    from . import pallas_nn

    # NOTE: the scalar-prefetch host-list path (score_hypotheses_slab) is
    # kept EXPERIMENTAL and off: numerically correct (matches the plain
    # kernel to 1e-6) but measured ~30x slower at full lattice scale on
    # this TPU — per-grid-step tile DMA appears unpipelined under
    # PrefetchScalarGridSpec here. The VMEM-resident kernel below is the
    # production path; revisit with explicit double-buffered DMA.
    use_experimental_hostlist = False
    if (use_experimental_hostlist
            and isinstance(grid, pallas_nn.SortedSlab)
            and grid.host_bounds is not None):
        return score_hypotheses_slab(grid, obj_pts, obj_nrm, hyps,
                                     radius, sigma)

    def pow2(n):
        return 1 << max(int(np.ceil(np.log2(max(n, 1)))), 0)

    p, h = len(obj_pts), len(hyps)
    pp = pow2(p)
    pts_p = np.zeros((pp, 3), np.float32)
    pts_p[:p] = obj_pts
    nrm_p = np.zeros((pp, 3), np.float32)
    nrm_p[:p] = obj_nrm
    mask = np.zeros(pp, bool)
    mask[:p] = True
    pts_j, nrm_j, mask_j = (jnp.asarray(pts_p), jnp.asarray(nrm_p),
                            jnp.asarray(mask))

    h_slice = max(MAX_QUERIES_PER_LAUNCH // pp, 1)

    # async-dispatch all slices, then pull results (keeps the device busy
    # back-to-back while the host prepares the next slice)
    results = []
    for lo in range(0, max(h, 1), h_slice):
        sl = hyps[lo:lo + h_slice]
        mats_p = np.tile(np.eye(4, dtype=np.float32), (h_slice, 1, 1))
        mats_p[:len(sl)] = sl
        results.append((len(sl), score_hypotheses(
            grid, pts_j, nrm_j, mask_j, jnp.asarray(mats_p), radius, sigma,
            chunk=MAX_QUERIES_PER_LAUNCH)))
    out = np.empty(h, np.float32)
    lo = 0
    for n_sl, s in results:
        out[lo:lo + n_sl] = np.asarray(s)[:n_sl]
        lo += n_sl
    return out


def grid_search_hypotheses(bbox_min: np.ndarray, bbox_max: np.ndarray,
                           spacing: float = config.GRID_SEARCH_SPACING,
                           n_angles: int = config.GRID_SEARCH_N_ANGLES
                           ) -> tuple[np.ndarray, np.ndarray, int]:
    """Generate the (x, z, theta) hypothesis lattice over the scene bbox.

    Replicates the reference's f32 accumulation loops
    (pose_proposal.cpp:213-222): ox from -spacing while < length + spacing,
    angles from 0 while < 2*pi, each accumulated in float32.

    Returns (hyps (H,4,4) f32, cell_of_hyp (H,) int — which (ox,oz) cell
    each hypothesis belongs to, n_cells).
    """
    length_x = np.float32(bbox_max[0]) - np.float32(bbox_min[0])
    length_z = np.float32(bbox_max[2]) - np.float32(bbox_min[2])
    sp = np.float32(spacing)

    def f32_range(limit):
        vals = []
        v = np.float32(-sp)
        while v < limit:
            vals.append(v)
            v = np.float32(v + sp)
        return np.array(vals, dtype=np.float32)

    oxs = f32_range(np.float32(length_x + sp))
    ozs = f32_range(np.float32(length_z + sp))
    inc = np.float32(2.0 * np.pi / n_angles)
    angles = []
    a = np.float32(0.0)
    while a < np.float32(2.0 * np.pi):
        angles.append(a)
        a = np.float32(a + inc)
    angles = np.array(angles, dtype=np.float32)

    n_cells = len(oxs) * len(ozs)
    ca, sa = np.cos(angles), np.sin(angles)
    # rotation about +Y (msh_rotate with (0,1,0), pose_proposal.cpp:221)
    rots = np.zeros((len(angles), 4, 4), dtype=np.float32)
    rots[:, 0, 0] = ca
    rots[:, 0, 2] = sa
    rots[:, 2, 0] = -sa
    rots[:, 2, 2] = ca
    rots[:, 1, 1] = 1
    rots[:, 3, 3] = 1

    ox_g, oz_g = np.meshgrid(oxs, ozs, indexing="ij")
    tx = (np.float32(bbox_min[0]) + ox_g.ravel()).astype(np.float32)
    tz = (np.float32(bbox_min[2]) + oz_g.ravel()).astype(np.float32)

    hyps = np.tile(rots[None, :, :, :], (n_cells, 1, 1, 1))
    hyps[:, :, 0, 3] = tx[:, None]
    hyps[:, :, 1, 3] = 0.0
    hyps[:, :, 2, 3] = tz[:, None]
    cell_of_hyp = np.repeat(np.arange(n_cells), len(angles))
    return hyps.reshape(-1, 4, 4), cell_of_hyp, n_cells
