#!/usr/bin/env python
"""Multi-device scaling artifact (SCALING_r05): wall-clock for the sharded
production launches at 1/2/4/8 mesh devices on the virtual CPU mesh.

What this CAN and CANNOT show on this machine: the host has ONE physical
core (CLAUDE.md), so the 8 virtual XLA CPU devices timeslice it and a real
wall-clock SPEEDUP is physically impossible here. What the artifact
establishes is the other half of the scaling claim:

* correctness — every mesh size produces the same scores/poses (gated);
* no serialization pathology — fixed TOTAL workload, wall-clock stays
  ~flat as the mesh grows (sharding adds only collective/dispatch
  overhead, bounded below as `overhead_vs_1dev`);
* the per-device workload genuinely shrinks 1/N (reported from the
  sharded launch geometry), and each launch needs at most one scalar
  psum — which is what rides ICI on real chips.

Run:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
          python tools/run_scaling.py [--small] [--out SCALING_r05.json]
(pytest's conftest env works too; the script sets the env itself when run
standalone, before importing jax.)
"""

import argparse
import json
import os
import sys
import time

if "xla_force_host_platform_device_count" not in os.environ.get(
        "XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                               " --xla_force_host_platform_device_count=8")
# FORCE cpu (not setdefault): this shell exports JAX_PLATFORMS=axon, and
# rescan_tpu/__init__ re-pins jax.config from the env var — a setdefault
# would leave "axon" standing and park the study on the TPU tunnel.
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")
import numpy as np  # noqa: E402

from rescan_tpu.ops import hashgrid, icp  # noqa: E402
from rescan_tpu.parallel import mesh as pmesh  # noqa: E402

MESH_SIZES = (1, 2, 4, 8)


def _timed(fn, n_runs=3):
    """min-of-n wall clock; fn must RETURN fetched (host) results."""
    fn()  # warm / compile
    best, out = float("inf"), None
    for _ in range(n_runs):
        t0 = time.perf_counter()
        out = fn()
        best = min(best, time.perf_counter() - t0)
    return best, out


def scoring_workload(small):
    """score_multi_sharded — THE production scoring launch (ScoreStream's
    sharded path) — at a fixed total (hypothesis x point) workload."""
    import jax.numpy as jnp
    r = np.random.default_rng(3)
    n_scene = 20_000 if small else 120_000
    n_obj = 512 if small else 1024
    H = 256 if small else 2048
    pts = r.uniform(0, 4, (n_scene, 3)).astype(np.float32)
    pts[:, 1] *= 0.4
    nrm = np.zeros((n_scene, 3), np.float32)
    nrm[:, 1] = 1
    grid = hashgrid.build_grid(pts, 0.1, normals=nrm)
    obj = pts[:n_obj] + np.array([0.01, 0.004, -0.008], np.float32)
    objn = nrm[:n_obj]
    pts_all = jnp.asarray(obj[None])      # one owner row
    nrm_all = jnp.asarray(objn[None])
    mask_all = jnp.ones((1, n_obj), bool)
    hyps = np.tile(np.eye(4, dtype=np.float32), (H, 1, 1))
    hyps[:, 0, 3] = np.linspace(-0.15, 0.15, H)
    hyps[:, 2, 3] = np.linspace(0.1, -0.1, H)
    owner = np.zeros(H, np.int32)

    rows = {}
    ref = None
    for n in MESH_SIZES:
        m = pmesh.make_flat_mesh(n)
        h = jnp.asarray(hyps)
        o = jnp.asarray(owner)

        def launch():
            return np.asarray(pmesh.score_multi_sharded(
                m, grid, pts_all, nrm_all, mask_all, h, o, 0.1, 0.1))

        wall, out = _timed(launch)
        if ref is None:
            ref = out
        rows[n] = {"wall_s": round(wall, 4),
                   "hyps_per_device": H // n,
                   "max_abs_diff_vs_1dev": float(np.abs(out - ref).max())}
    return {"shape": {"scene_pts": n_scene, "obj_pts": n_obj,
                      "hypotheses": H},
            "collectives_per_launch": "none (hypothesis axis is "
                                      "embarrassingly parallel)",
            "by_mesh": rows}


def icp_workload(small):
    """icp_refine_indexed_sharded — the production refine launch — at a
    fixed total pair batch."""
    r = np.random.default_rng(5)
    n_scene = 20_000 if small else 80_000
    n_pts = 512 if small else 2048
    B = 16 if small else 64
    pts = r.uniform(0, 4, (n_scene, 3)).astype(np.float32)
    pts[:, 1] *= 0.4
    nrm = np.zeros((n_scene, 3), np.float32)
    nrm[:, 1] = 1
    grid = hashgrid.build_grid(pts, 0.1, normals=nrm)
    objs = [pts[:n_pts] + np.array([0.02, 0.01, 0.0], np.float32),
            pts[n_scene // 2:n_scene // 2 + n_pts]
            + np.array([-0.015, 0.0, 0.01], np.float32)]
    nrms = [nrm[:n_pts], nrm[:n_pts]]
    upts, unrm, umask = icp.prep_unique_batch(objs, nrms)
    own = (np.arange(B) % 2).astype(np.int32)
    val = np.ones(B, bool)
    T0 = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    T0[:, 0, 3] = r.uniform(-0.02, 0.02, B).astype(np.float32)

    rows = {}
    ref = None
    for n in MESH_SIZES:
        m = pmesh.make_flat_mesh(n)

        def launch():
            T, err = pmesh.icp_refine_indexed_sharded(
                m, grid, upts, unrm, umask, own, val, T0, 0.1,
                float(np.deg2rad(60.0)))
            return T

        wall, T = _timed(launch)
        if ref is None:
            ref = T
        # gate on aligned-point residual (reduction order may differ)
        p = objs[0]
        a = p @ ref[0][:3, :3].T + ref[0][:3, 3]
        b = p @ T[0][:3, :3].T + T[0][:3, 3]
        rows[n] = {"wall_s": round(wall, 4),
                   "pairs_per_device": B // n,
                   "aligned_residual_vs_1dev": float(np.abs(a - b).mean())}
    return {"shape": {"scene_pts": n_scene, "obj_pts": n_pts, "pairs": B},
            "by_mesh": rows}


def production_workload(small, sizes=(1, 8)):
    """The full pose_proposal stage (RESCAN_DEVICES caps the mesh)."""
    import tempfile
    from rescan_tpu.utils import synthetic
    from rescan_tpu.pipeline import seg2rsdb, pose_proposal

    d = tempfile.mkdtemp(prefix="scaling_pp_")
    res = 6 if small else 8
    spec = synthetic.SceneSpec(room_size=(2.0, 2.0), wall_height=1.0,
                               objects=[
        ("chair", (0.5, 0.5), (0.35, 0.5, 0.35), 0.0),
        ("table", (1.4, 1.2), (0.5, 0.4, 0.35), 0.0)])
    synthetic.save_scene_ply(os.path.join(d, "s0.ply"), spec, resolution=res)
    moved = synthetic.moved_scene_spec(spec, (0.3, 0.2), which=0)
    synthetic.save_scene_ply(os.path.join(d, "s1.ply"), moved,
                             resolution=res, seed=1)
    synthetic.write_class_file(os.path.join(d, "classes.txt"))
    seg2rsdb.main([os.path.join(d, "s0.ply"), os.path.join(d, "classes.txt"),
                   os.path.join(d, "s0.rsdb")])

    rows = {}
    poses = {}
    for n in sizes:
        os.environ["RESCAN_DEVICES"] = str(n)
        try:
            walls = []
            for rep in range(2):   # first run carries that mesh's compiles
                db = pose_proposal.run(
                    os.path.join(d, "s0.rsdb"), os.path.join(d, "s1.ply"),
                    os.path.join(d, f"s1_pp_{n}.rsdb"), verbose=False,
                    save_outputs=False)
                walls.append(float(db.last_pose_proposal_seconds))
            sc = db.proposed_scores[-1]
            poses[n] = [np.asarray(p) for p in db.proposed_poses[-1]
                        if p is not None]
            rows[n] = {"wall_warm_s": round(min(walls), 3),
                       "wall_cold_s": round(walls[0], 3),
                       "n_proposals": int(sum(len(s) for s in sc
                                              if s is not None))}
        finally:
            os.environ.pop("RESCAN_DEVICES", None)
    a, b = (np.concatenate([p.reshape(-1) for p in poses[s]])
            for s in sizes[:2]) if len(sizes) >= 2 else (None, None)
    same = (a is not None and a.shape == b.shape
            and bool(np.allclose(a, b, atol=1e-4)))
    return {"resolution": res, "by_mesh": rows,
            "proposals_equal_across_meshes": same}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true",
                    help="CI-scale shapes (fast; NOT bench-like)")
    ap.add_argument("--skip-production", action="store_true")
    ap.add_argument("--out", default="SCALING_r05.json")
    args = ap.parse_args(argv)

    t0 = time.time()
    art = {
        "host_physical_cores": os.cpu_count(),
        "virtual_devices": len(jax.devices()),
        "platform": jax.devices()[0].platform,
        "note": ("8 virtual XLA CPU devices timeslice ONE physical core: "
                 "wall-clock speedup >1x is physically impossible here. "
                 "This artifact gates (a) result equality across mesh "
                 "sizes, (b) flat wall-clock at fixed total workload "
                 "(sharding overhead bound), (c) 1/N per-device workload "
                 "— the quantity that scales on a real multi-chip ICI "
                 "mesh."),
    }
    print("scoring workload ...")
    art["scoring"] = scoring_workload(args.small)
    print(json.dumps(art["scoring"]["by_mesh"], indent=1))
    print("indexed-ICP workload ...")
    art["icp_indexed"] = icp_workload(args.small)
    print(json.dumps(art["icp_indexed"]["by_mesh"], indent=1))
    if not args.skip_production:
        print("production pose_proposal 1-vs-8 ...")
        art["production_pose_proposal"] = production_workload(args.small)
        print(json.dumps(art["production_pose_proposal"]["by_mesh"],
                         indent=1))

    for key in ("scoring", "icp_indexed"):
        walls = {n: v["wall_s"] for n, v in art[key]["by_mesh"].items()}
        art[key]["overhead_vs_1dev"] = {
            n: round(w / walls[1], 3) for n, w in walls.items()}
    art["elapsed_s"] = round(time.time() - t0, 1)
    with open(args.out, "w") as f:
        json.dump(art, f, indent=1, default=str)
    print(f"wrote {args.out} ({art['elapsed_s']}s)")


if __name__ == "__main__":
    main()
