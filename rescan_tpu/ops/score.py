"""Batched pose-hypothesis alignment scoring — hot loop #1 of the pipeline.

The reference scores one (object, pose) at a time with OpenMP radius
searches (mgs_compute_object_alignment_score,
apps/pose_proposal/pose_proposal.cpp:93-158) inside a triple host loop over
(grid cell x, grid cell z, angle) (mgs__initial_pose_proposals, :170-254).
Here ALL hypotheses of ALL objects are scored in a stream of fixed-shape
device launches: transform (H, P, 3) points, run the fused gated
nearest-neighbor search against the scene level-1 grid (no neighbor-index
tracking — scoring needs only distance and normal dot), reduce
per-hypothesis.

Per-point score (pose_proposal.cpp:127-156): for the nearest in-radius scene
point whose normal passes the 35-degree gate,

    score = 0.05 * exp(-angle^2 / (2 * 0.5^2)) + 0.95 * exp(-d^2 / (2 * sigma^2))

with radius = sigma = 0.1 (search_radii[search_lvl=1], :98-101); unmatched
points contribute 0; the hypothesis score is the mean over all object
points at the query level.

Padding discipline (see ops/pallas_nn.py): object points are Morton-sorted
and padded per-hypothesis to a power of two — replicate-last up to the
next QUERY_BLOCK boundary (tight block bbox, masked out of the mean), far
sentinels beyond (whole far blocks skip their tile loops); tail
hypotheses of a launch slice are translated FAR so their blocks are free.

Known deviation from the reference: the reference caps its radius search at
the 64 nearest neighbors (:179), so a point whose 64 nearest scene points
all fail the normal gate scores 0 even when a farther in-radius point would
pass; we search the full radius. This inflates scores slightly at surface
boundaries; parity is gated on pipeline metrics (mAP), not on score bits.
"""

from __future__ import annotations

import functools
import os
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import config
from . import pallas_nn, search


@functools.partial(jax.jit, static_argnames=("chunk",))
def score_hypotheses(grid, obj_pts: jax.Array,
                     obj_nrm: jax.Array, obj_mask: jax.Array,
                     hyps: jax.Array, radius, sigma,
                     chunk: int = 2048) -> jax.Array:
    """Score H pose hypotheses for one object (single-object device fn;
    the production stages go through score_requests below).

    Args:
      grid: scene search index (level 1, normals attached).
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
    d2, dot, found = search.gated_min(
        grid, q.reshape(H * P, 3), qn.reshape(H * P, 3), radius, cos_gate,
        chunk=chunk, bq=pallas_nn.block_for_scoring(P))
    found = found.reshape(H, P) & obj_mask[None, :]
    d2 = jnp.where(found, d2.reshape(H, P), 0.0)
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
# JAX async dispatch pipelines the slice stream. Sized large (4M queries,
# ~16k Pallas grid steps) because under the axon tunnel EVERY launch pays
# a ~50 ms host round trip regardless of device time — measured 57 ms/launch
# at 32768 queries vs <1 ms of kernel time; the bench L4 pass is ~53k
# hypotheses x 512 pts = 26 launches at 1M, 7 at 4M (BUDGET_r03).
MAX_QUERIES_PER_LAUNCH = 1 << 22


def _pow2(n: int) -> int:
    return 1 << max(int(np.ceil(np.log2(max(n, 1)))), 0)


def prep_points(obj_pts: np.ndarray, obj_nrm: np.ndarray
                ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Morton-sort and pad one object's query-level points for scoring.

    Returns (pts (Pp, 3), nrm (Pp, 3), mask (Pp,)) with Pp = pow2:
    points sorted for tight QUERY_BLOCK runs, replicate-last padding up to
    the next block boundary, far sentinels beyond (their blocks skip the
    kernel's tile loop entirely).
    """
    p = len(obj_pts)
    pp = max(_pow2(p), 128)
    bq = pallas_nn.block_for_scoring(pp)
    order = pallas_nn.morton_order(obj_pts)
    pts = np.full((pp, 3), pallas_nn.FAR, np.float32)
    nrm = np.zeros((pp, 3), np.float32)
    mask = np.zeros(pp, bool)
    pts[:p] = np.asarray(obj_pts, np.float32)[order]
    nrm[:p] = np.asarray(obj_nrm, np.float32)[order]
    mask[:p] = True
    edge = min(((p + bq - 1) // bq) * bq, pp)
    if p and edge > p:
        pts[p:edge] = pts[p - 1]
        nrm[p:edge] = nrm[p - 1]
    return pts, nrm, mask


def _score_multi_impl(grid, pts_all: jax.Array, nrm_all: jax.Array,
                      mask_all: jax.Array, hyps: jax.Array, owner: jax.Array,
                      radius, sigma) -> jax.Array:
    """Score h hypotheses whose object points come from pts_all[owner[h]].

    pts_all/nrm_all: (R, Pp, 3); mask_all: (R, Pp); hyps: (h, 4, 4);
    owner: (h,) int32. Returns (h,) scores. (Unjitted body — the
    single-device path jits it below; parallel/mesh.py shard_maps it over
    the hypothesis axis.)
    """
    R = hyps[:, :3, :3]
    t = hyps[:, :3, 3]
    pts = jnp.take(pts_all, owner, axis=0)      # (h, Pp, 3)
    nrm = jnp.take(nrm_all, owner, axis=0)
    mask = jnp.take(mask_all, owner, axis=0)    # (h, Pp)
    q = jnp.einsum("hij,hpj->hpi", R, pts) + t[:, None, :]
    qn = jnp.einsum("hij,hpj->hpi", R, nrm)
    h, Pp = mask.shape

    cos_gate = jnp.cos(jnp.deg2rad(config.SCORE_MAX_ANGLE_DEG))
    d2, dot, found = search.gated_min(
        grid, q.reshape(h * Pp, 3), qn.reshape(h * Pp, 3), radius, cos_gate,
        bq=pallas_nn.block_for_scoring(Pp))
    found = found.reshape(h, Pp) & mask
    d2 = jnp.where(found, d2.reshape(h, Pp), 0.0)
    dot = jnp.clip(dot.reshape(h, Pp), 0.0, 1.0)
    angle = jnp.arccos(dot)
    per_pt = (config.SCORE_ALPHA
              * jnp.exp(-(angle * angle)
                        / (2.0 * config.SCORE_NORMAL_SIGMA ** 2))
              + (1.0 - config.SCORE_ALPHA)
              * jnp.exp(-d2 / (2.0 * sigma * sigma)))
    per_pt = jnp.where(found, per_pt, 0.0)
    cnt = jnp.maximum(jnp.sum(mask, axis=1), 1)
    return jnp.sum(per_pt, axis=1) / cnt


_score_multi = jax.jit(_score_multi_impl)


# RESCAN_PRUNE_STATS=1: every ScoreStream request is also recorded here as
# (grid, padded_pts, mask, hyps) for offline prune-efficiency analysis
# (tools/roofline_note.py) — the per-block near-tile ranges the Pallas
# kernel will compute are host-reproducible from exactly these inputs.
PRUNE_STATS: List[tuple] = []


class ScoreStream:
    """Asynchronous scoring of (object points, hypotheses) requests.

    Requests are grouped by padded point count Pp so hypotheses of
    DIFFERENT objects share fixed-shape launches (compiled programs are
    reused across objects, levels, and stages); each launch slices the
    hypothesis stream so h_slice * Pp <= MAX_QUERIES_PER_LAUNCH, and tail
    slots are padded with FAR translations (their query blocks are free).
    ``submit`` eagerly DISPATCHES every full slice (JAX async dispatch
    keeps the device busy while the host prepares/prunes the next
    request); ``collect`` flushes the partial tails, blocks, and returns
    per-request score arrays.

    Eager dispatch caps the object-table row count per group at a fixed
    _ROWS (occupied row slots are FAR until their object arrives —
    FAR-padded query blocks cost only the kernel prologue), keeping
    launch shapes identical whether a slice fires early or at collect.

    ``mesh``: an optional device mesh — launches then shard the hypothesis
    axis across all mesh devices (parallel/mesh.py score_multi_sharded),
    with the scene index and object point tables replicated.
    """

    _ROWS = 16   # object-table capacity per (Pp-group, generation)

    def __init__(self, grid, radius: float, sigma: float, mesh=None):
        self.grid = grid
        self.radius = radius
        self.sigma = sigma
        self.mesh = mesh
        self._groups = {}   # Pp -> group state dict
        self._results = []  # request idx -> scores
        self._n_req = 0

    def _new_group(self, pp: int) -> dict:
        return {"pts": np.full((self._ROWS, pp, 3), pallas_nn.FAR,
                               np.float32),
                "nrm": np.zeros((self._ROWS, pp, 3), np.float32),
                "mask": np.zeros((self._ROWS, pp), bool),
                "n_rows": 0, "pts_j": None,
                "hyps": [], "owners": [], "req": [],
                "launched": [],   # (n_valid, device scores) in order
                "n_queued": 0}

    def _h_slice(self, pp: int) -> int:
        h = max(MAX_QUERIES_PER_LAUNCH // pp, 1)
        if self.mesh is not None:
            nd = int(self.mesh.devices.size)
            h = max((h // nd) * nd, nd)
        return h

    def _launch(self, g: dict, pp: int, hyps: np.ndarray,
                owners: np.ndarray) -> None:
        # full slices launch at h_slice; TAIL flushes launch at the pow2
        # bucket covering their real hypothesis count (padding everything
        # to h_slice made a 100-hyp tail a 4M-query launch — near-free on
        # the TPU kernel whose FAR blocks skip their tile loops, but real
        # work on the CPU engines the tests run on). pow2 buckets keep the
        # compiled-program set small and shared across stages.
        h_slice = min(self._h_slice(pp),
                      max(_pow2(len(hyps)), 256))
        if self.mesh is not None:
            nd = int(self.mesh.devices.size)
            h_slice = max((h_slice // nd) * nd, nd)
        if g["pts_j"] is None:
            # ship the pow2 row prefix only (a 1-object group uploads one
            # row, not the whole capacity); FAR rows beyond n_rows are
            # never referenced by owners
            rp = _pow2(max(g["n_rows"], 1))
            g["pts_j"] = jnp.asarray(g["pts"][:rp])
            g["nrm_j"] = jnp.asarray(g["nrm"][:rp])
            g["mask_j"] = jnp.asarray(g["mask"][:rp])
        mats_p = np.tile(np.eye(4, dtype=np.float32), (h_slice, 1, 1))
        # FAR-translate tail hypotheses: their query blocks have an empty
        # near-tile range and cost only the block prologue
        mats_p[:, :3, 3] = 2 * pallas_nn.FAR
        mats_p[:len(hyps)] = hyps
        own_p = np.zeros(h_slice, np.int32)
        own_p[:len(owners)] = owners
        if self.mesh is not None:
            from ..parallel import mesh as pmesh
            s = pmesh.score_multi_sharded(
                self.mesh, self.grid, g["pts_j"], g["nrm_j"], g["mask_j"],
                jnp.asarray(mats_p), jnp.asarray(own_p),
                self.radius, self.sigma)
        else:
            s = _score_multi(self.grid, g["pts_j"], g["nrm_j"], g["mask_j"],
                             jnp.asarray(mats_p), jnp.asarray(own_p),
                             self.radius, self.sigma)
        g["launched"].append((len(hyps), s))

    def _drain_full_slices(self, g: dict, pp: int) -> None:
        h_slice = self._h_slice(pp)
        while g["n_queued"] >= h_slice:
            hyps = np.concatenate(g["hyps"], axis=0)
            owners = np.concatenate(g["owners"])
            self._launch(g, pp, hyps[:h_slice], owners[:h_slice])
            g["hyps"] = [hyps[h_slice:]]
            g["owners"] = [owners[h_slice:]]
            g["n_queued"] = len(hyps) - h_slice

    def submit(self, obj_pts: np.ndarray, obj_nrm: np.ndarray,
               hyps: np.ndarray, prepped=None) -> int:
        """Queue one request; returns its index. ``prepped`` optionally
        carries a cached prep_points(obj_pts, obj_nrm) result. Full
        launch slices dispatch immediately."""
        pts, nrm, mask = prepped if prepped is not None else \
            prep_points(obj_pts, obj_nrm)
        pp = len(pts)
        g = self._groups.get(pp)
        if g is None or g["n_rows"] == self._ROWS:
            # a full object table forces a flush of its queued tail so
            # row ids stay consistent, then a fresh generation
            if g is not None:
                self._flush(g, pp)
                self._finalize(g)
            g = self._new_group(pp)
            self._groups[pp] = g
        slot = g["n_rows"]
        g["pts"][slot] = pts
        g["nrm"][slot] = nrm
        g["mask"][slot] = mask
        g["n_rows"] += 1
        g["pts_j"] = None   # table changed; re-ship on next launch
        h = np.asarray(hyps, np.float32).reshape(-1, 4, 4)
        if os.environ.get("RESCAN_PRUNE_STATS") == "1":
            PRUNE_STATS.append((self.grid, pts, mask, h))
        g["hyps"].append(h)
        g["owners"].append(np.full(len(h), slot, np.int32))
        g["req"].append((self._n_req, len(h)))
        g["n_queued"] += len(h)
        self._results.append(None)
        self._n_req += 1
        self._drain_full_slices(g, pp)
        return self._n_req - 1

    def _flush(self, g: dict, pp: int) -> None:
        if g["n_queued"]:
            hyps = np.concatenate(g["hyps"], axis=0)
            owners = np.concatenate(g["owners"])
            self._launch(g, pp, hyps, owners)
            g["hyps"], g["owners"], g["n_queued"] = [], [], 0

    def _finalize(self, g: dict) -> None:
        scores = np.concatenate(
            [np.asarray(s)[:n] for n, s in g["launched"]]) \
            if g["launched"] else np.zeros(0, np.float32)
        offset = 0
        for req_idx, n_h in g["req"]:
            self._results[req_idx] = scores[offset:offset + n_h]
            offset += n_h

    def collect(self) -> List[np.ndarray]:
        """Flush partial tails and gather all scores."""
        for pp, g in sorted(self._groups.items()):
            self._flush(g, pp)
        for pp, g in sorted(self._groups.items()):
            self._finalize(g)
        self._groups = {}
        return self._results


def score_requests(grid, requests: Sequence[Tuple[np.ndarray, np.ndarray,
                                                  np.ndarray]],
                   radius, sigma, mesh=None) -> List[np.ndarray]:
    """Score a batch of (obj_pts, obj_nrm, hyps) requests; returns one
    (H_i,) score array per request. See ScoreStream for the batching."""
    stream = ScoreStream(grid, radius, sigma, mesh=mesh)
    for pts, nrm, hyps in requests:
        stream.submit(pts, nrm, hyps)
    return stream.collect()


def score_hypotheses_bucketed(grid, obj_pts: np.ndarray,
                              obj_nrm: np.ndarray, hyps: np.ndarray,
                              radius, sigma, chunk: int = 2048,
                              mesh=None) -> np.ndarray:
    """Single-request convenience wrapper over score_requests."""
    return score_requests(grid, [(obj_pts, obj_nrm, hyps)], radius, sigma,
                          mesh=mesh)[0]


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
