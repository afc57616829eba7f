"""Voxel occupancy grids and pairwise overlap factors.

Re-implements lib/rs/intersect.h with vectorized numpy (these grids are
small — object bboxes at 0.1 m voxels — and feed the host-side greedy NMS,
so host numpy is the right home; the large scene-coverage grids used by the
arrangement energy live on device in ops/energy.py).

Semantics preserved exactly:
* grid over the union bbox fattened by 0.3 m, res = ceil(extent/voxel) + 1
  (isect_grid3d_init, intersect.h:58-75)
* transformed bbox from LEVEL 3 points (isect_get_transformed_aabbox, :111-122)
* boundary rasterization from LEVEL 1 points (:176-208)
* interior fill: per-y-slice scanline even-odd in +x and +z directions,
  a cell is INSIDE if both directional fills agree (:125-174, :210-276);
  the fill counter increments on BOUNDARY -> FREE transitions
* overlap factor = |A and B| / max(|A|, |B|) (or min) (:309-368)
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from .. import config

FREE, BOUNDARY, INSIDE, OVERLAP = 0, 1, 2, 3


def transformed_bbox(points_lvl3: np.ndarray, pose: np.ndarray
                     ) -> Tuple[np.ndarray, np.ndarray]:
    p = points_lvl3 @ pose[:3, :3].T + pose[:3, 3]
    return p.min(axis=0), p.max(axis=0)


def grid_shape(bmin: np.ndarray, bmax: np.ndarray, voxel: float):
    fat = config.ISECT_FAT_FACTOR
    bmin = np.asarray(bmin, np.float32) - fat
    bmax = np.asarray(bmax, np.float32) + fat
    res = (np.ceil((bmax - bmin) / np.float32(voxel)).astype(np.int64) + 1)
    return bmin, res


def rasterize_boundary(points_lvl1: np.ndarray, pose: np.ndarray,
                       origin: np.ndarray, res: np.ndarray, voxel: float
                       ) -> np.ndarray:
    """Mark BOUNDARY cells; returns uint8 grid indexed [y, z, x]
    (reference layout: data[(y*x_res*z_res) + z*x_res + x], intersect.h:93)."""
    p = points_lvl1 @ pose[:3, :3].T + pose[:3, 3]
    c = np.floor((p - origin) / np.float32(voxel)).astype(np.int64)
    c = np.clip(c, 0, res[None, :] - 1)  # reference asserts in-range
    grid = np.zeros((res[1], res[2], res[0]), dtype=np.uint8)
    grid[c[:, 1], c[:, 2], c[:, 0]] = BOUNDARY
    return grid


def _directional_fill(sl: np.ndarray, axis: int) -> np.ndarray:
    """Even-odd scanline fill of one y-slice (z, x) along ``axis``.

    Fill counter increments at BOUNDARY -> FREE transitions; a cell is
    filled when the counter is odd, scanning both forward and backward;
    filled-both-ways non-boundary cells become INSIDE
    (isect__compute_occupancy_within_slice, intersect.h:125-174)."""
    def fill(arr):
        prev = np.zeros_like(arr)
        if axis == 1:
            prev[:, 1:] = arr[:, :-1]
        else:
            prev[1:, :] = arr[:-1, :]
        trans = (arr == FREE) & (prev == BOUNDARY)
        cnt = np.cumsum(trans, axis=axis)
        return (cnt % 2) == 1

    fwd = fill(sl)
    bwd = np.flip(fill(np.flip(sl, axis=axis)), axis=axis)
    out = sl.copy()
    inside = (sl != BOUNDARY) & fwd & bwd
    out[inside] = INSIDE
    return out


def fill_occupancy(grid: np.ndarray) -> np.ndarray:
    """Interior fill of a boundary grid [y, z, x]: combine x-direction and
    z-direction slice fills (intersect.h:243-262)."""
    out = np.empty_like(grid)
    for y in range(grid.shape[0]):
        sl = grid[y]
        fx = _directional_fill(sl, axis=1)   # scan along x
        fz = _directional_fill(sl, axis=0)   # scan along z
        comb = np.full_like(sl, FREE)
        comb[(fx == BOUNDARY) | (fz == BOUNDARY)] = BOUNDARY
        comb[(fx == INSIDE) & (fz == INSIDE)] = INSIDE
        out[y] = comb
    return out


def overlap_factor(pc_a, pose_a: np.ndarray, pc_b, pose_b: np.ndarray,
                   voxel: float = config.NMS_OVERLAP_VOXEL,
                   voxelize_inside: bool = True,
                   normalize_by_smaller: bool = False) -> float:
    """Voxel overlap of two posed clouds (isect_get_overlap_factor,
    intersect.h:309-368). ``pc_*`` are PointCloud objects."""
    amin, amax = transformed_bbox(pc_a.pos(config.ISECT_BBOX_LVL), pose_a)
    bmin, bmax = transformed_bbox(pc_b.pos(config.ISECT_BBOX_LVL), pose_b)
    if (amin > bmax).any() or (bmin > amax).any():
        return 0.0
    cmin = np.minimum(amin, bmin)
    cmax = np.maximum(amax, bmax)
    origin, res = grid_shape(cmin, cmax, voxel)

    ga = rasterize_boundary(pc_a.pos(config.ISECT_RASTER_LVL), pose_a,
                            origin, res, voxel)
    gb = rasterize_boundary(pc_b.pos(config.ISECT_RASTER_LVL), pose_b,
                            origin, res, voxel)
    if voxelize_inside:
        ga = fill_occupancy(ga)
        gb = fill_occupancy(gb)
        ca = int((ga > FREE).sum())
        cb = int((gb > FREE).sum())
    else:
        ca = int((ga == BOUNDARY).sum())
        cb = int((gb == BOUNDARY).sum())

    both = (ga > FREE) & (gb > FREE)
    cnt = int(both.sum())
    denom = min(ca, cb) if normalize_by_smaller else max(ca, cb)
    if denom <= 0:
        return 1.0
    return cnt / denom
