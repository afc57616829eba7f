"""Device neighbor-search vs brute force and the native host grid."""

import numpy as np
import jax.numpy as jnp

from rescan_tpu.ops import hashgrid
from rescan_tpu.core import native


def _brute_radius_knn(pts, q, radius, k):
    d2 = ((q[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    ok = d2 < radius * radius
    d2m = np.where(ok, d2, np.inf)
    order = np.argsort(d2m, axis=1)[:, :k]
    kd2 = np.take_along_axis(d2m, order, axis=1)
    idx = np.where(np.isfinite(kd2), order, -1)
    return idx, kd2


def test_radius_knn_vs_brute(rng):
    pts = rng.uniform(0, 1, (2000, 3)).astype(np.float32)
    q = rng.uniform(-0.1, 1.1, (300, 3)).astype(np.float32)
    radius, k = 0.08, 8
    grid = hashgrid.build_grid(pts, radius)
    idx, d2, cnt = hashgrid.radius_knn(grid, jnp.asarray(q), radius, k)
    idx, d2, cnt = np.asarray(idx), np.asarray(d2), np.asarray(cnt)
    bidx, bd2 = _brute_radius_knn(pts, q, radius, k)
    # same neighbor sets (distances equal; ties may reorder indices)
    np.testing.assert_allclose(np.where(np.isfinite(d2), d2, 0),
                               np.where(np.isfinite(bd2), bd2, 0), atol=1e-6)
    assert (cnt == (bidx >= 0).sum(1)).all()
    # indices agree where distances are unique
    for i in range(len(q)):
        assert set(idx[i][idx[i] >= 0]) == set(bidx[i][bidx[i] >= 0])


def test_radius_knn_vs_host_grid(rng):
    pts = rng.uniform(0, 2, (5000, 3)).astype(np.float32)
    q = pts[rng.integers(0, 5000, 500)] + rng.normal(0, 0.01, (500, 3)).astype(np.float32)
    q = q.astype(np.float32)
    radius, k = 0.05, 16
    grid = hashgrid.build_grid(pts, radius)
    idx, d2, cnt = hashgrid.radius_knn(grid, jnp.asarray(q), radius, k)
    hg = native.HostGrid(pts, radius)
    hidx, hd2, hcnt = hg.radius_search(q, radius, k)
    assert (np.asarray(cnt) == hcnt).all()
    np.testing.assert_allclose(
        np.where(np.isfinite(np.asarray(d2)), np.asarray(d2), 0),
        np.where(hidx >= 0, hd2, 0), atol=1e-6)


def test_nearest_gated_vs_brute(rng):
    n, m = 3000, 400
    pts = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    nrm = rng.normal(size=(n, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    q = rng.uniform(0, 1, (m, 3)).astype(np.float32)
    qn = rng.normal(size=(m, 3)).astype(np.float32)
    qn /= np.linalg.norm(qn, axis=1, keepdims=True)
    radius = 0.1
    cos_gate = np.cos(np.deg2rad(35.0))

    grid = hashgrid.build_grid(pts, radius, normals=nrm)
    idx, d2, dot = hashgrid.nearest_gated(
        grid, jnp.asarray(q), jnp.asarray(qn), radius, cos_gate)
    idx, d2, dot = np.asarray(idx), np.asarray(d2), np.asarray(dot)

    bd2 = ((q[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    bdot = np.maximum(qn @ nrm.T, 0.0)
    ok = (bd2 < radius**2) & (bdot >= cos_gate - 1e-6)
    bd2m = np.where(ok, bd2, np.inf)
    bbest = np.argmin(bd2m, axis=1)
    bfound = np.isfinite(bd2m[np.arange(m), bbest])

    assert ((idx >= 0) == bfound).all()
    sel = bfound
    np.testing.assert_allclose(d2[sel], bd2m[np.arange(m), bbest][sel], atol=1e-7)
    # index can differ only on exact distance ties
    mism = sel & (idx != bbest)
    assert not mism.any() or np.allclose(
        d2[mism], bd2[mism, idx[mism]], atol=1e-7)


def test_nearest_gated_abs_dot(rng):
    pts = np.array([[0.0, 0, 0], [0.02, 0, 0]], np.float32)
    nrm = np.array([[0.0, -1, 0], [0, 1, 0]], np.float32)  # first is flipped
    q = np.array([[0.005, 0, 0]], np.float32)
    qn = np.array([[0.0, 1, 0]], np.float32)
    grid = hashgrid.build_grid(pts, 0.05, normals=nrm)
    cos70 = np.cos(np.deg2rad(70))
    # without abs: flipped normal fails gate -> second point wins
    idx, _, _ = hashgrid.nearest_gated(grid, q, qn, 0.05, cos70)
    assert int(idx[0]) == 1
    # with abs (label-transfer semantics, filters.cpp:769): first wins
    idx, _, _ = hashgrid.nearest_gated(grid, q, qn, 0.05, cos70, use_abs_dot=True)
    assert int(idx[0]) == 0


def test_empty_radius(rng):
    pts = rng.uniform(0, 1, (100, 3)).astype(np.float32)
    q = np.array([[10.0, 10.0, 10.0]], np.float32)  # far away
    grid = hashgrid.build_grid(pts, 0.05)
    idx, d2, cnt = hashgrid.radius_knn(grid, q, 0.05, 4)
    assert int(cnt[0]) == 0 and (np.asarray(idx[0]) == -1).all()


def test_poisson_subsample_invariants(rng):
    pts = rng.uniform(0, 1, (5000, 3)).astype(np.float32)
    voxel = 0.05
    idx = native.poisson_subsample(pts, voxel)
    samples = pts[idx]
    # 1. first point is always a sample (first-unmarked-in-order rule)
    assert idx[0] == 0
    # 2. no two samples closer than voxel
    d2 = ((samples[:, None] - samples[None, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, 1e9)
    assert d2.min() >= voxel**2 - 1e-9
    # 3. every point within voxel of some sample
    dmin = ((pts[:, None] - samples[None, :]) ** 2).sum(-1).min(1)
    assert dmin.max() < voxel**2 + 1e-9
    # 4. deterministic
    assert np.array_equal(idx, native.poisson_subsample(pts, voxel))
