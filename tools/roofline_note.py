#!/usr/bin/env python
"""Gated-NN scoring-kernel roofline / prune-efficiency analysis
(VERDICT r3 item 3b: is 5-6 Mq/s a hardware bound, or is the kernel
prune-efficiency-bound?).

Runs the bench pose_proposal with RESCAN_PRUNE_STATS=1 so every scoring
request records (grid, padded points, mask, hyps); then reproduces, on the
host, the EXACT per-block near-tile ranges the Pallas kernel computes
(ops/pallas_nn._nn_kernel:150-165 — block bbox vs tile bounds, dynamic
[lo, hi) loop range) and reports:

  - computed tiles / skipped tiles / span per 128-query block,
  - candidate points scanned per query vs true in-radius neighbors
    (prune efficiency; native HostGrid ground truth on a sample),
  - analytic VMEM bytes + VPU lane-ops per computed tile,
  - with --measure (TPU): measured per-launch times fitted to
    t = n_blocks * c_prologue + computed * c_tile + skipped * c_skip,
    and the implied VPU throughput vs peak.

    python tools/roofline_note.py [--small] [--measure] [--out FILE.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

BQ = 128  # block_for_scoring: every scoring launch uses 128-wide blocks

# analytic per-lane op count of the tile body (pallas_nn._nn_kernel:179-211):
# 3 sub + 3 mul + 2 add (d2), 3 mul + 2 add (ndot), ~6 compare/select/min
LANE_OPS = 19


def analyze_entry(slabs, pts, mask, hyps, scene_grid_host, sample_blocks,
                  rng):
    """Host replication of the kernel's per-block pruning for one request.
    Returns per-block arrays (near, span) + sampled true-neighbor counts."""
    # tile bounds of every part: (n_tiles, 8) xmin ymin zmin _ xmax ymax zmax
    bounds = [np.asarray(s.tile_bounds) for s in slabs]
    P = len(pts)
    n_blocks = P // BQ
    H = len(hyps)
    R = hyps[:, :3, :3].astype(np.float32)
    t = hyps[:, :3, 3].astype(np.float32)
    # (H, P, 3) transformed queries, blocked (H*n_blocks, BQ, 3)
    q = np.einsum("hij,pj->hpi", R, pts.astype(np.float32)) + t[:, None, :]
    qb = q.reshape(H * n_blocks, BQ, 3)
    bmin = qb.min(axis=1)
    bmax = qb.max(axis=1)
    near_ct = np.zeros(len(qb), np.int64)
    span_ct = np.zeros(len(qb), np.int64)
    rad = analyze_entry.radius
    for tb in bounds:
        lo_ok = tb[None, :, 0:3] <= bmax[:, None, :] + rad
        hi_ok = tb[None, :, 4:7] >= bmin[:, None, :] - rad
        near = (lo_ok & hi_ok).all(axis=2)          # (nb, n_tiles)
        near_ct += near.sum(axis=1)
        any_near = near.any(axis=1)
        ii = np.arange(near.shape[1])
        lo = np.where(near, ii, near.shape[1]).min(axis=1)
        hi = np.where(near, ii, -1).max(axis=1) + 1
        span_ct += np.where(any_near, hi - lo, 0)
    # ground-truth neighbor counts on a sample of real-query blocks
    true_counts = []
    if scene_grid_host is not None and sample_blocks:
        real = np.nonzero(bmin[:, 0] < 1e5)[0]  # skip FAR blocks
        if len(real):
            pick = rng.choice(real, size=min(sample_blocks, len(real)),
                              replace=False)
            for b in pick:
                _, _, cnt = scene_grid_host.radius_search(qb[b], rad, 1)
                true_counts.append(int((cnt > 0).sum()))
    return near_ct, span_ct, true_counts


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--measure", action="store_true",
                    help="also time representative launches (TPU)")
    ap.add_argument("--out", default="ROOFLINE_r04.json")
    ap.add_argument("--sample_blocks", type=int, default=2,
                    help="blocks per request for ground-truth NN counts")
    args = ap.parse_args()

    os.environ["RESCAN_PRUNE_STATS"] = "1"
    if args.small:
        os.environ["RESCAN_BENCH_SMALL"] = "1"

    import bench
    from rescan_tpu import config
    from rescan_tpu.core import native
    from rescan_tpu.ops import score

    bench.prepare_inputs()
    t0 = time.perf_counter()
    bench.timed_run("roofline")
    run_s = time.perf_counter() - t0
    print(f"ROOFLINE: pipeline run {run_s:.1f}s, "
          f"{len(score.PRUNE_STATS)} scoring requests recorded")

    # scene level-1 host grid for ground-truth neighbor counts
    from rescan_tpu.core.pointcloud import PointCloud
    from rescan_tpu.ops import pallas_nn
    scn = PointCloud.from_ply(os.path.join(bench.BENCH_DIR, "scan_001.ply"))
    slvl = config.SCORE_SEARCH_LVL
    host_grid = native.HostGrid(scn.pos(slvl), config.SCORE_SEARCH_RADII[slvl])
    analyze_entry.radius = float(config.SCORE_SEARCH_RADII[slvl])

    # on the CPU backend the pipeline's index is a HashGrid; the pruning
    # analysis is host math over the TPU kernel's tile bounds, so rebuild
    # the SortedSlab the TPU path would have used (same points, same
    # Morton tiling) and analyze against it
    fallback_slab = None

    def slabs_of(grid):
        nonlocal fallback_slab
        parts = getattr(grid, "slabs", None)
        if parts:
            return parts
        if isinstance(grid, pallas_nn.SortedSlab):
            return [grid]
        if fallback_slab is None:
            fallback_slab = pallas_nn.build_sorted_slab(
                scn.pos(slvl), scn.nrm(slvl))
        return [fallback_slab]

    rng = np.random.default_rng(0)
    tot_near = tot_span = tot_blocks = tot_q = 0
    far_blocks = 0
    true_counts = []
    tile = None
    for grid, pts, mask, hyps in score.PRUNE_STATS:
        slabs = slabs_of(grid)
        tile = slabs[0].tile
        near, span, tc = analyze_entry(slabs, pts, mask, hyps, host_grid,
                                       args.sample_blocks, rng)
        tot_near += int(near.sum())
        tot_span += int(span.sum())
        tot_blocks += len(near)
        far_blocks += int((near == 0).sum())
        tot_q += int(mask.sum()) * len(hyps)
        true_counts.extend(tc)

    mean_near = tot_near / max(tot_blocks - far_blocks, 1)
    cand_per_q = tot_near * tile * BQ / max(tot_q, 1)
    true_mean = float(np.mean(true_counts)) if true_counts else float("nan")
    # analytic per-computed-tile costs
    vmem_bytes_tile = tile * 8 * 4
    lane_ops_tile = BQ * tile * LANE_OPS

    report = {
        "config": "small" if args.small else "bench-scale",
        "bq": BQ, "tile": int(tile) if tile else None,
        "n_requests": len(score.PRUNE_STATS),
        "total_query_blocks": tot_blocks,
        "far_blocks_pct": round(100 * far_blocks / max(tot_blocks, 1), 1),
        "mean_computed_tiles_per_real_block": round(mean_near, 2),
        "mean_span_tiles_per_block": round(
            tot_span / max(tot_blocks - far_blocks, 1), 2),
        "candidate_points_per_query": round(cand_per_q / BQ, 1),
        "true_neighbors_per_query_sampled": round(true_mean / BQ, 2)
        if true_counts else None,
        "prune_efficiency_note": "candidate/true ratio is the headroom a "
                                 "finer tile cut could reclaim",
        "vmem_bytes_per_computed_tile": vmem_bytes_tile,
        "lane_ops_per_computed_tile": lane_ops_tile,
    }

    if args.measure:
        import jax
        import jax.numpy as jnp
        entry = score.PRUNE_STATS[-1]
        grid, pts, mask, hyps = entry
        h = min(len(hyps), 2048)
        pts_j = jnp.asarray(pts[None])
        nrm_j = jnp.zeros_like(pts_j)
        mask_j = jnp.asarray(mask[None])
        mats = jnp.asarray(hyps[:h])
        own = jnp.zeros(h, jnp.int32)
        s = score._score_multi(grid, pts_j, nrm_j, mask_j, mats, own,
                               analyze_entry.radius, analyze_entry.radius)
        np.asarray(s)  # warm
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            s = score._score_multi(grid, pts_j, nrm_j, mask_j, mats, own,
                                   analyze_entry.radius,
                                   analyze_entry.radius)
            np.asarray(s)
            times.append(time.perf_counter() - t0)
        near, span, _ = analyze_entry(slabs_of(grid), pts, mask, hyps[:h],
                                      None, 0, rng)
        launch_s = min(times)
        computed = int(near.sum())
        skipped = int((span - near).sum())
        nb = len(near)
        report["measured_launch"] = {
            "h": h, "pp": len(pts), "launch_s": round(launch_s, 4),
            "n_blocks": nb, "computed_tiles": computed,
            "skipped_tiles": skipped,
            "us_per_computed_tile_upper": round(1e6 * launch_s / max(
                computed, 1), 2),
            "implied_lane_ops_per_s": round(
                computed * lane_ops_tile / launch_s / 1e12, 3),
            "note": "upper bound attributes ALL time to computed tiles; "
                    "subtract n_blocks*prologue and skipped*skip-cost for "
                    "the true per-tile figure (BASELINE.md: ~18us "
                    "prologue, ~0.4us skip on v5e)",
        }

    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
        f.write("\n")
    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
