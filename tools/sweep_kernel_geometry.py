#!/usr/bin/env python
"""Pallas gated-NN kernel geometry sweep (QUERY_BLOCK x SCENE_TILE).

Measures, per variant, on the bench scene's level-1 slab:
  * scoring-shape throughput: gated_min on H x P = 8192 x 512 lattice-like
    queries (the L4 pass shape),
  * ICP-shape throughput: nearest_gated on 2M queries of object points at
    proposal poses (one ICP while_loop iteration's search).

Each variant runs in a FRESH subprocess (the geometry binds at import via
RESCAN_QUERY_BLOCK / RESCAN_SCENE_TILE) and pays its own tunnel compile;
timings are min-of-3 on the warmed program.

    python tools/sweep_kernel_geometry.py            # run the sweep
    python tools/sweep_kernel_geometry.py --one      # measure current env
"""

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure() -> dict:
    import time

    import numpy as np
    import jax.numpy as jnp

    import bench
    from rescan_tpu import config
    from rescan_tpu.core import database
    from rescan_tpu.core.pointcloud import PointCloud
    from rescan_tpu.ops import pallas_nn, score, search

    bench.prepare_inputs()
    scn = PointCloud.from_ply(os.path.join(bench.BENCH_DIR, "scan_001.ply"))
    slvl = config.SCORE_SEARCH_LVL
    radius = config.SCORE_SEARCH_RADII[slvl]
    grid = search.build_index(scn.pos(slvl), radius, normals=scn.nrm(slvl))
    db = database.load_database(
        os.path.join(bench.BENCH_DIR, "scan_000.rsdb"), load_pointclouds=True)
    dyn = [i for i in range(len(db.objects)) if not db.is_object_static(i)]
    obj = db.objects[dyn[0]].cloud

    rng = np.random.default_rng(0)
    bmin, bmax = scn.bbox

    def lattice_hyps(H):
        T = np.tile(np.eye(4, dtype=np.float32), (H, 1, 1))
        ang = rng.random(H).astype(np.float32) * 2 * np.pi
        ca, sa = np.cos(ang), np.sin(ang)
        T[:, 0, 0] = ca
        T[:, 0, 2] = sa
        T[:, 2, 0] = -sa
        T[:, 2, 2] = ca
        T[:, 0, 3] = rng.uniform(bmin[0], bmax[0], H)
        T[:, 2, 3] = rng.uniform(bmin[2], bmax[2], H)
        return T

    out = {"QUERY_BLOCK": pallas_nn.QUERY_BLOCK,
           "SCENE_TILE": pallas_nn.SCENE_TILE}

    # scoring shape: level-4 object points, 8192 hyps
    lvl4 = config.GRID_SEARCH_LEVELS[0]
    prepped = score.prep_points(obj.pos(lvl4), obj.nrm(lvl4))
    H = 8192
    hyps = lattice_hyps(H)

    def scoring_pass():
        st = score.ScoreStream(grid, radius, radius)
        st.submit(None, None, hyps, prepped=prepped)
        return st.collect()

    scoring_pass()
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        scoring_pass()
        reps.append(time.perf_counter() - t0)
    nq = H * prepped[0].shape[0]
    out["scoring_queries"] = int(nq)
    out["scoring_s"] = round(min(reps), 4)
    out["scoring_mq_per_s"] = round(nq / min(reps) / 1e6, 2)

    # ICP iteration shape: one 2M-query nearest_gated on level-2 points
    icp_lvl = config.REFINE_ICP_LVL
    from rescan_tpu.ops import icp as icp_ops
    upts, unrm, umask = icp_ops.prep_unique_batch(
        [db.objects[i].cloud.pos(icp_lvl) for i in dyn],
        [db.objects[i].cloud.nrm(icp_lvl) for i in dyn])
    igrid = search.build_index(scn.pos(icp_lvl), config.REFINE_ICP_MAX_DIST,
                               normals=scn.nrm(icp_lvl))
    B = 256
    own = rng.integers(0, len(dyn), B).astype(np.int32)
    T = lattice_hyps(B)
    q = (np.einsum("bij,bnj->bni", T[:, :3, :3], upts[own])
         + T[:, None, :3, 3]).reshape(-1, 3).astype(np.float32)
    qn = np.einsum("bij,bnj->bni", T[:, :3, :3],
                   unrm[own]).reshape(-1, 3).astype(np.float32)
    qj, qnj = jnp.asarray(q), jnp.asarray(qn)

    def icp_pass():
        idx, d2, dot = search.nearest_gated(
            igrid, qj, qnj, config.REFINE_ICP_MAX_DIST,
            float(np.cos(np.deg2rad(config.REFINE_ICP_MAX_ANGLE_DEG))),
            bq=pallas_nn.block_for(upts.shape[1]))
        return np.asarray(d2)

    icp_pass()
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        icp_pass()
        reps.append(time.perf_counter() - t0)
    out["icp_queries"] = int(len(q))
    out["icp_s"] = round(min(reps), 4)
    out["icp_mq_per_s"] = round(len(q) / min(reps) / 1e6, 2)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--one", action="store_true")
    ap.add_argument("--out", default="/tmp/kernel_sweep.jsonl")
    args = ap.parse_args()

    if args.one:
        print("SWEEP " + json.dumps(measure()))
        return 0

    variants = [(256, 2048), (512, 2048), (128, 2048),
                (256, 1024), (512, 1024), (1024, 2048),
                (256, 4096), (512, 4096), (512, 512)]
    results = []
    with open(args.out, "w") as f:
        for bq, st in variants:
            env = dict(os.environ, RESCAN_QUERY_BLOCK=str(bq),
                       RESCAN_SCENE_TILE=str(st))
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one"],
                env=env, capture_output=True, text=True, timeout=1800)
            line = [ln for ln in r.stdout.splitlines()
                    if ln.startswith("SWEEP ")]
            if not line:
                print(f"variant ({bq},{st}) FAILED:\n{r.stdout[-2000:]}"
                      f"{r.stderr[-2000:]}")
                continue
            rec = json.loads(line[0][6:])
            results.append(rec)
            f.write(json.dumps(rec) + "\n")
            f.flush()
            print(json.dumps(rec))
    results.sort(key=lambda r: r["scoring_s"] + r["icp_s"])
    print("\n| BQ | ST | scoring Mq/s | icp Mq/s |\n|---|---|---|---|")
    for r in results:
        print(f"| {r['QUERY_BLOCK']} | {r['SCENE_TILE']} "
              f"| {r['scoring_mq_per_s']} | {r['icp_mq_per_s']} |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
