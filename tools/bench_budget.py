#!/usr/bin/env python
"""Device-vs-wall perf budget for the headline pose_proposal stage
(VERDICT r2 item 3).

Runs the bench-scene stage THREE times in one process (run 1 warms
compiles + remote program loads; runs 2-3 are the steady state), captures
the per-substage wall profile of the warm runs, then microbenches the two
dominant device programs — a scoring launch and the batched-ICP program —
by re-executing them on captured shapes (min over repeats ~= launch tax +
device time; the pipeline-wall minus the projected launch cost is host
orchestration + prep).

    python tools/bench_budget.py [--out BUDGET.json]

Writes the budget JSON and prints a markdown table for BASELINE.md.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="BUDGET.json")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    import bench
    from rescan_tpu import config
    from rescan_tpu.ops import icp, score, search
    from rescan_tpu.pipeline import pose_proposal

    bench.prepare_inputs()

    profiles = []
    walls = []
    for k in range(args.runs):
        t0 = time.perf_counter()
        from rescan_tpu.core import database
        db = pose_proposal.run(
            os.path.join(bench.BENCH_DIR, "scan_000.rsdb"),
            os.path.join(bench.BENCH_DIR, "scan_001.ply"),
            os.path.join(bench.BENCH_DIR, f"scan_001_pp_budget{k}.rsdb"),
            verbose=(k > 0), save_outputs=False)
        walls.append(time.perf_counter() - t0)
        profiles.append(dict(db.last_pose_proposal_timings))
        print(f"BUDGET: run {k}: " + " ".join(
            f"{kk}={vv:.2f}" for kk, vv in profiles[-1].items()))

    warm = {k: min(p[k] for p in profiles[1:] if k in p)
            for k in profiles[-1]}

    # --- scoring-launch microbench: one full-size ScoreStream slice -----
    from rescan_tpu.core.pointcloud import PointCloud
    scn = PointCloud.from_ply(os.path.join(bench.BENCH_DIR, "scan_001.ply"))
    slvl = config.SCORE_SEARCH_LVL
    radius = sigma = config.SCORE_SEARCH_RADII[slvl]
    grid = search.build_index(scn.pos(slvl), radius, normals=scn.nrm(slvl))
    dbo = database.load_database(
        os.path.join(bench.BENCH_DIR, "scan_000.rsdb"),
        load_pointclouds=True)
    dyn = [i for i in range(len(dbo.objects))
           if not dbo.is_object_static(i)]
    obj = dbo.objects[dyn[0]].cloud
    lvl = config.GRID_SEARCH_LEVELS[0]
    prepped = score.prep_points(obj.pos(lvl), obj.nrm(lvl))
    P = prepped[0].shape[0]
    H = max(1, score.MAX_QUERIES_PER_LAUNCH // P)
    hyps = np.tile(np.eye(4, dtype=np.float32), (H, 1, 1))
    hyps[:, 0, 3] = np.linspace(0.0, 3.5, H)

    def one_scoring_launch():
        st = score.ScoreStream(grid, radius, sigma)
        st.submit(None, None, hyps, prepped=prepped)
        return st.collect()

    one_scoring_launch()  # warm
    reps = []
    for _ in range(5):
        t0 = time.perf_counter()
        one_scoring_launch()
        reps.append(time.perf_counter() - t0)
    scoring_launch_s = min(reps)
    scoring = {"queries_per_launch": int(H * P), "H": int(H), "P": int(P),
               "launch_s": round(scoring_launch_s, 4)}

    # --- ICP-program microbench: the bench-shape batched ICP ------------
    import jax.numpy as jnp
    icp_lvl = config.REFINE_ICP_LVL
    icp_grid = search.build_index(scn.pos(icp_lvl),
                                  config.REFINE_ICP_MAX_DIST,
                                  normals=scn.nrm(icp_lvl))
    pts_l = [dbo.objects[i].cloud.pos(icp_lvl) for i in dyn for _ in (0, 1)]
    nrm_l = [dbo.objects[i].cloud.nrm(icp_lvl) for i in dyn for _ in (0, 1)]
    n_min = max(len(dbo.objects[i].cloud.pos(icp_lvl)) for i in dyn)
    pts_b, nrm_b, mask_b = icp.pad_batch(pts_l, nrm_l, n_min=n_min)
    B, N = mask_b.shape
    Bp = max(1 << int(np.ceil(np.log2(max(B, 1)))), 256)
    pts_b = np.pad(pts_b, ((0, Bp - B), (0, 0), (0, 0)),
                   constant_values=2e6)
    nrm_b = np.pad(nrm_b, ((0, Bp - B), (0, 0), (0, 0)))
    mask_b = np.pad(mask_b, ((0, Bp - B), (0, 0)))
    T0 = np.tile(np.eye(4, dtype=np.float32), (Bp, 1, 1))
    # real proposal transforms (identity poses converge in ~1 iteration and
    # undershoot the device time; the while_loop runs to max_iter only for
    # genuinely-moving pairs) — taken from a prior bench.py save if present
    pp_bin = os.path.join(bench.BENCH_DIR, "scan_001_pp_measured",
                          "scan_001_pp_measured.bin")
    if os.path.exists(pp_bin):
        from rescan_tpu.io import rsdb as rsdbio
        pl, _ = rsdbio.load_pose_proposals(pp_bin)
        flat = [T for P in pl if P is not None for T in P]
        if flat:
            reps_T = np.stack([flat[j % len(flat)] for j in range(Bp)])
            T0 = reps_T.astype(np.float32)

    def one_icp():
        T, e = icp.icp_align_batched(
            jnp.asarray(pts_b), jnp.asarray(nrm_b), jnp.asarray(mask_b),
            icp_grid, jnp.asarray(T0), config.REFINE_ICP_MAX_DIST,
            np.deg2rad(config.REFINE_ICP_MAX_ANGLE_DEG))
        return np.asarray(T)

    one_icp()
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        one_icp()
        reps.append(time.perf_counter() - t0)
    icp_prog = {"batch": int(Bp), "n_pts_padded": int(pts_b.shape[1]),
                "exec_s": round(min(reps), 4)}

    out = {
        "metric_runs_wall_s": [round(w, 2) for w in walls],
        "warm_substage_wall_s": {k: round(v, 2) for k, v in warm.items()},
        "scoring_launch": scoring,
        "icp_program": icp_prog,
        "notes": "launch_s/exec_s are min-of-repeats on warmed programs: "
                 "tunnel launch tax + device time. Substage wall minus "
                 "(launches x launch cost) = host prep + orchestration.",
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(json.dumps(out))
    print("\n| substage | warm wall (s) |\n|---|---|")
    for k, v in warm.items():
        print(f"| {k} | {v:.2f} |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
