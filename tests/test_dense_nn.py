"""Dense MXU nearest-neighbor engine vs the windowed grid engine."""

import numpy as np
import jax.numpy as jnp

from rescan_tpu.ops import dense_nn, hashgrid, search


def _data(rng, n=3000, m=500):
    pts = rng.uniform(0, 2, (n, 3)).astype(np.float32)
    nrm = rng.normal(size=(n, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    q = rng.uniform(0, 2, (m, 3)).astype(np.float32)
    qn = rng.normal(size=(m, 3)).astype(np.float32)
    qn /= np.linalg.norm(qn, axis=1, keepdims=True)
    return pts, nrm, q, qn


def test_dense_matches_windowed(rng):
    pts, nrm, q, qn = _data(rng)
    radius = 0.15
    cos_gate = np.cos(np.deg2rad(35.0))
    grid = hashgrid.build_grid(pts, radius, normals=nrm)
    di = dense_nn.build_dense_index(pts, nrm)

    gi, gd2, gdot = (np.asarray(x) for x in hashgrid.nearest_gated(
        grid, jnp.asarray(q), jnp.asarray(qn), radius, cos_gate))
    didx, dd2, ddot = (np.asarray(x) for x in dense_nn.nearest_gated_dense(
        di, jnp.asarray(q), jnp.asarray(qn), radius, cos_gate))

    same_found = (gi >= 0) == (didx >= 0)
    assert same_found.mean() > 0.999  # boundary fp can flip a stray query
    both = (gi >= 0) & (didx >= 0)
    np.testing.assert_allclose(dd2[both], gd2[both], atol=2e-5)
    # index agreement except distance ties / fp-boundary cases
    agree = (didx[both] == gi[both]).mean()
    assert agree > 0.99


def test_dense_abs_dot(rng):
    pts, nrm, q, qn = _data(rng, 1000, 200)
    di = dense_nn.build_dense_index(pts, nrm)
    grid = hashgrid.build_grid(pts, 0.2, normals=nrm)
    cos70 = np.cos(np.deg2rad(70.0))
    gi, _, _ = (np.asarray(x) for x in hashgrid.nearest_gated(
        grid, jnp.asarray(q), jnp.asarray(qn), 0.2, cos70, use_abs_dot=True))
    didx, _, _ = (np.asarray(x) for x in dense_nn.nearest_gated_dense(
        di, jnp.asarray(q), jnp.asarray(qn), 0.2, cos70, use_abs_dot=True))
    both = (gi >= 0) & (didx >= 0)
    assert ((gi >= 0) == (didx >= 0)).mean() > 0.995
    assert (didx[both] == gi[both]).mean() > 0.99


def test_dense_chunked_equals_unchunked(rng):
    pts, nrm, q, qn = _data(rng, 2000, 700)
    di = dense_nn.build_dense_index(pts, nrm)
    a = dense_nn.nearest_gated_dense(di, jnp.asarray(q), jnp.asarray(qn),
                                     0.1, 0.5, chunk=4096)
    b = dense_nn.nearest_gated_dense(di, jnp.asarray(q), jnp.asarray(qn),
                                     0.1, 0.5, chunk=256)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_search_dispatch(rng):
    from rescan_tpu.ops import pallas_nn
    pts, nrm, q, qn = _data(rng, 500, 50)
    slab = search.build_index(pts, 0.1, normals=nrm, prefer_dense=True)
    grid = search.build_index(pts, 0.1, normals=nrm, prefer_dense=False)
    assert isinstance(slab, pallas_nn.SortedSlab)
    assert isinstance(grid, hashgrid.HashGrid)
    # index_arrays round-trips the original order for all engines
    dense = dense_nn.build_dense_index(pts, nrm)
    for idx in (slab, grid, dense):
        p, n = search.index_arrays(idx)
        np.testing.assert_allclose(np.asarray(p)[:len(pts)], pts, atol=1e-5)
        np.testing.assert_allclose(np.asarray(n)[:len(pts)], nrm, atol=1e-6)


def test_pallas_matches_grid_interpret(rng):
    """The Pallas kernel (interpret mode on CPU) agrees with the windowed
    engine on found-set, distances, and indices."""
    from rescan_tpu.ops import pallas_nn
    pts, nrm, q, qn = _data(rng, 1500, 300)
    slab = pallas_nn.build_sorted_slab(pts, nrm)
    grid = hashgrid.build_grid(pts, 0.15, normals=nrm)
    cg = np.cos(np.deg2rad(35.0))
    pi, pd2, pdot = (np.asarray(x) for x in pallas_nn.nearest_gated_pallas(
        slab, jnp.asarray(q), jnp.asarray(qn), 0.15, cg))
    gi, gd2, _ = (np.asarray(x) for x in hashgrid.nearest_gated(
        grid, jnp.asarray(q), jnp.asarray(qn), 0.15, cg))
    assert ((pi >= 0) == (gi >= 0)).mean() > 0.996
    both = (pi >= 0) & (gi >= 0)
    np.testing.assert_allclose(pd2[both], gd2[both], atol=3e-5)
    assert (pi[both] == gi[both]).mean() > 0.99


def test_icp_works_with_dense_index(rng):
    from rescan_tpu.ops import icp
    xy = rng.uniform(0, 2, (2000, 2)).astype(np.float32)
    z = 0.3 * np.sin(2 * xy[:, 0])
    pts = np.stack([xy[:, 0], xy[:, 1], z], 1).astype(np.float32)
    gx = 0.6 * np.cos(2 * xy[:, 0])
    nrm = np.stack([-gx, np.zeros(2000, np.float32), np.ones(2000, np.float32)], 1)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    nrm = nrm.astype(np.float32)
    obj = pts[:800] + rng.normal(0, 0.003, (800, 3)).astype(np.float32) \
        + np.array([0.02, 0.01, 0.0], np.float32)
    objn = nrm[:800]
    di = search.build_index(pts, 0.1, normals=nrm, prefer_dense=True)
    pts_b, nrm_b, mask_b = icp.pad_batch([obj], [objn])
    T, err = icp.icp_align_batched(
        jnp.asarray(pts_b), jnp.asarray(nrm_b), jnp.asarray(mask_b), di,
        jnp.asarray(np.eye(4, dtype=np.float32)[None]), 0.1,
        np.deg2rad(60.0))
    assert float(err[0]) < 0.02
    moved = obj @ np.asarray(T[0])[:3, :3].T + np.asarray(T[0])[:3, 3]
    assert np.abs(moved - pts[:800]).mean() < 0.02


def test_gated_min_matches_nearest(rng):
    """The idx-free scoring kernel returns the same (d2, dot, found) as
    the full nearest-neighbor kernel."""
    from rescan_tpu.ops import pallas_nn
    pts, nrm, q, qn = _data(rng, 1500, 300)
    slab = pallas_nn.build_sorted_slab(pts, nrm)
    cg = np.cos(np.deg2rad(35.0))
    pi, pd2, pdot = (np.asarray(x) for x in pallas_nn.nearest_gated_pallas(
        slab, jnp.asarray(q), jnp.asarray(qn), 0.15, cg))
    md2, mdot = (np.asarray(x) for x in pallas_nn.gated_min_pallas(
        slab, jnp.asarray(q), jnp.asarray(qn), 0.15, cg))
    found = pi >= 0
    np.testing.assert_array_equal(found, np.isfinite(md2))
    np.testing.assert_array_equal(pd2[found], md2[found])
    np.testing.assert_array_equal(pdot[found], mdot[found])


def test_score_requests_matches_single(rng):
    """Multi-object grouped launches produce the same scores as the
    single-object device function, including mixed point counts and the
    replicate/FAR padding discipline."""
    from rescan_tpu.ops import pallas_nn, score as score_mod
    pts, nrm, _, _ = _data(rng, 1200, 0)
    slab = pallas_nn.build_sorted_slab(pts, nrm)
    objs = [(pts[:50] + 0.01, nrm[:50]),
            (pts[100:400] + 0.005, nrm[100:400]),
            (pts[400:703], nrm[400:703])]
    reqs = []
    for k, (o, on) in enumerate(objs):
        hyps = np.tile(np.eye(4, dtype=np.float32), (3 + k, 1, 1))
        hyps[:, 0, 3] = np.linspace(-0.05, 0.05, 3 + k)
        reqs.append((o, on, hyps))
    got = score_mod.score_requests(slab, reqs, 0.1, 0.1)
    for (o, on, hyps), s in zip(reqs, got):
        p = len(o)
        pp = max(256, 1 << int(np.ceil(np.log2(p))))
        opad = np.zeros((pp, 3), np.float32)
        opad[:p] = o
        npad = np.zeros((pp, 3), np.float32)
        npad[:p] = on
        mask = np.zeros(pp, bool)
        mask[:p] = True
        ref = np.asarray(score_mod.score_hypotheses(
            slab, jnp.asarray(opad), jnp.asarray(npad), jnp.asarray(mask),
            jnp.asarray(hyps), 0.1, 0.1))
        np.testing.assert_allclose(s, ref, atol=1e-5)


def test_slabset_split_matches_single(rng, monkeypatch):
    """Scenes past the VMEM slab ceiling split into a Morton-part SlabSet;
    per-part kernels merged by running-min must equal the single slab
    EXACTLY (every point lives in exactly one part), for both the
    want_idx (ICP) and scoring query paths, and index_arrays must
    round-trip original point order."""
    from rescan_tpu.ops import pallas_nn

    pts, nrm, q, qn = _data(rng, n=4000, m=700)
    radius = 0.15
    cos_gate = np.cos(np.deg2rad(35.0))

    single = pallas_nn.build_sorted_slab(pts, nrm, tile=256)
    assert isinstance(single, pallas_nn.SortedSlab)
    monkeypatch.setattr(pallas_nn, "MAX_SLAB_COLS", 1024)
    sset = pallas_nn.build_sorted_slab(pts, nrm, tile=256)
    assert isinstance(sset, pallas_nn.SlabSet) and len(sset.slabs) >= 3
    assert sset.tile == 256

    si, sd2, sdot = (np.asarray(x) for x in search.nearest_gated(
        single, jnp.asarray(q), jnp.asarray(qn), radius, cos_gate, bq=128))
    mi, md2, mdot = (np.asarray(x) for x in search.nearest_gated(
        sset, jnp.asarray(q), jnp.asarray(qn), radius, cos_gate, bq=128))
    np.testing.assert_array_equal(si, mi)
    # each part subtracts its OWN center before (q - p)^2, so d2/dot agree
    # to fp rounding (~3e-8 abs), not bit-exactly
    np.testing.assert_allclose(sd2, md2, rtol=1e-5)
    np.testing.assert_allclose(sdot, mdot, rtol=1e-5, atol=1e-6)

    d2s, dots, fs = search.gated_min(single, jnp.asarray(q), jnp.asarray(qn),
                                     radius, cos_gate, bq=128)
    d2m, dotm, fm = search.gated_min(sset, jnp.asarray(q), jnp.asarray(qn),
                                     radius, cos_gate, bq=128)
    np.testing.assert_allclose(np.asarray(d2s), np.asarray(d2m), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(fs), np.asarray(fm))

    op, on_ = search.index_arrays(sset)
    np.testing.assert_allclose(np.asarray(op), pts, atol=1e-6)
    np.testing.assert_allclose(np.asarray(on_), nrm, atol=1e-6)
