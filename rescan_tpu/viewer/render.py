"""Offline surfel renderer — the framework's rsdb inspection tool.

The reference ships an OpenGL/GLFW viewer (apps/rsdb_viewer/main.cpp) whose
pipeline role is scripted screenshots for visual debugging
(main.cpp:496-503, :1020-1028; vis modes proposals/optimized/identity
:81). A GL window makes no sense on a TPU host, so this is a headless
z-buffer point-splat renderer: vectorized projection + painter-resolve in
numpy, PNG output with a dependency-free encoder. It renders the same
things the reference viewer shows — scenes and placed objects colored by
RGB / class / instance / level — with the NYU40 palette.
"""

from __future__ import annotations

import struct
import zlib
from typing import Optional, Sequence, Tuple

import numpy as np

# NYU40 color palette (scripts/util.py create_color_palette)
NYU40_PALETTE = np.array([
    (0, 0, 0), (174, 199, 232), (152, 223, 138), (31, 119, 180),
    (255, 187, 120), (188, 189, 34), (140, 86, 75), (255, 152, 150),
    (214, 39, 40), (197, 176, 213), (148, 103, 189), (196, 156, 148),
    (23, 190, 207), (178, 76, 76), (247, 182, 210), (66, 188, 102),
    (219, 219, 141), (140, 57, 197), (202, 185, 52), (51, 176, 203),
    (200, 54, 131), (92, 193, 61), (78, 71, 183), (172, 114, 82),
    (255, 127, 14), (91, 163, 138), (153, 98, 156), (140, 153, 101),
    (158, 218, 229), (100, 125, 154), (178, 127, 135), (120, 185, 128),
    (146, 111, 194), (44, 160, 44), (112, 128, 144), (96, 207, 209),
    (227, 119, 194), (213, 92, 176), (94, 106, 211), (82, 84, 163),
    (100, 85, 144)], dtype=np.uint8)


# ---------------------------------------------------------------------------
# Diverging colormap (score visualization)
#
# The reference bakes a cool-warm table (lib/rs/diverging_map.inl); here the
# same Moreland smooth cool-warm map is COMPUTED: sRGB -> CIELAB -> Msh,
# linear interpolation in Msh with a white control point at the midpoint
# (Moreland, "Diverging Color Maps for Scientific Visualization", 2009).
# ---------------------------------------------------------------------------

def _srgb_to_msh(rgb):
    rgb = np.asarray(rgb, np.float64)
    lin = np.where(rgb > 0.04045, ((rgb + 0.055) / 1.055) ** 2.4,
                   rgb / 12.92)
    M = np.array([[0.4124, 0.3576, 0.1805],
                  [0.2126, 0.7152, 0.0722],
                  [0.0193, 0.1192, 0.9505]])
    xyz = lin @ M.T
    white = np.array([0.95047, 1.0, 1.08883])
    r = xyz / white

    def f(t):
        return np.where(t > 0.008856, np.cbrt(t), 7.787 * t + 16.0 / 116.0)

    fx, fy, fz = f(r[..., 0]), f(r[..., 1]), f(r[..., 2])
    L = 116.0 * fy - 16.0
    a = 500.0 * (fx - fy)
    b = 200.0 * (fy - fz)
    Mm = np.sqrt(L * L + a * a + b * b)
    s = np.where(Mm > 1e-9, np.arccos(np.clip(L / np.maximum(Mm, 1e-9),
                                              -1, 1)), 0.0)
    h = np.arctan2(b, a)
    return np.stack([Mm, s, h], axis=-1)


def _msh_to_srgb(msh):
    Mm, s, h = msh[..., 0], msh[..., 1], msh[..., 2]
    L = Mm * np.cos(s)
    a = Mm * np.sin(s) * np.cos(h)
    b = Mm * np.sin(s) * np.sin(h)
    fy = (L + 16.0) / 116.0
    fx = fy + a / 500.0
    fz = fy - b / 200.0

    def finv(t):
        return np.where(t ** 3 > 0.008856, t ** 3, (t - 16.0 / 116.0) / 7.787)

    white = np.array([0.95047, 1.0, 1.08883])
    xyz = np.stack([finv(fx), finv(fy), finv(fz)], axis=-1) * white
    Minv = np.array([[3.2406, -1.5372, -0.4986],
                     [-0.9689, 1.8758, 0.0415],
                     [0.0557, -0.2040, 1.0570]])
    lin = np.clip(xyz @ Minv.T, 0.0, 1.0)
    return np.where(lin > 0.0031308,
                    1.055 * lin ** (1.0 / 2.4) - 0.055, 12.92 * lin)


def diverging_colors(t: np.ndarray,
                     low=(0.230, 0.299, 0.754),
                     high=(0.706, 0.016, 0.150)) -> np.ndarray:
    """Cool-warm diverging colors for t in [0, 1]; (..., 3) float in [0,1]."""
    t = np.clip(np.asarray(t, np.float64), 0.0, 1.0)
    m_low = _srgb_to_msh(np.asarray(low))
    m_high = _srgb_to_msh(np.asarray(high))
    m_white = max(m_low[0], m_high[0], 88.0)

    def adjust_hue(sat_msh, m_unsat):
        Mm, s, h = sat_msh
        if Mm >= m_unsat - 0.1 or s < 0.05:
            return h
        spin = s * np.sqrt(m_unsat ** 2 - Mm ** 2) / (Mm * np.sin(s))
        return h + (spin if h > -np.pi / 3.0 else -spin)

    left = t < 0.5
    ti = np.where(left, 2.0 * t, 2.0 * t - 1.0)
    # each half interpolates toward/from white with the hue carried from
    # that half's SATURATED endpoint (spin-adjusted), so hue stays stable
    a = np.where(left[..., None], m_low, [m_white, 0.0,
                                          adjust_hue(m_high, m_white)])
    b = np.where(left[..., None],
                 [m_white, 0.0, adjust_hue(m_low, m_white)], m_high)
    msh = a + ti[..., None] * (b - a)
    return _msh_to_srgb(msh)


def write_png(path: str, image: np.ndarray) -> None:
    """Minimal RGB8 PNG writer (no external deps)."""
    h, w, _ = image.shape
    raw = b"".join(b"\x00" + image[y].tobytes() for y in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        c = struct.pack(">I", len(data)) + tag + data
        return c + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)

    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n")
        f.write(chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)))
        f.write(chunk(b"IDAT", zlib.compress(raw, 6)))
        f.write(chunk(b"IEND", b""))


def look_at(eye, target, up=(0.0, 1.0, 0.0)) -> np.ndarray:
    eye = np.asarray(eye, np.float64)
    f = np.asarray(target, np.float64) - eye
    f /= np.linalg.norm(f)
    r = np.cross(f, np.asarray(up, np.float64))
    r /= np.linalg.norm(r)
    u = np.cross(r, f)
    view = np.eye(4)
    view[0, :3], view[1, :3], view[2, :3] = r, u, -f
    view[:3, 3] = -view[:3, :3] @ eye
    return view


def render_points(points: np.ndarray, colors: np.ndarray,
                  view: np.ndarray, width: int = 1024, height: int = 768,
                  fov_deg: float = 55.0, point_px: int = 2,
                  bg: Tuple[int, int, int] = (20, 20, 24),
                  shade_normals: Optional[np.ndarray] = None,
                  radii: Optional[np.ndarray] = None,
                  edl_strength: float = 0.0,
                  return_zbuf: bool = False):
    """Z-buffered point splatting. colors in [0,1] float or uint8.

    ``radii``: per-point world radii — splat size becomes the PROJECTED
    surfel size (clipped to [1, 6] px), the headless counterpart of the
    reference's geometry-shader surfels (lib/rs/cloudvis.h:4-20).
    ``edl_strength`` > 0 applies Eye-Dome Lighting: a screen-space depth
    shading pass (cloudvis EDL mode) on the finished z-buffer.
    With return_zbuf, returns (img, zbuf) so overlays can depth-test."""
    p = np.asarray(points, np.float64)
    cam = p @ view[:3, :3].T + view[:3, 3]
    z = -cam[:, 2]
    vis = z > 1e-4
    cam, z = cam[vis], z[vis]
    col = np.asarray(colors)[vis]
    if col.dtype != np.uint8:
        col = np.clip(col * 255.0, 0, 255).astype(np.uint8)
    if shade_normals is not None:
        n = np.asarray(shade_normals, np.float64)[vis]
        light = np.array([0.4, 0.8, 0.45])
        light /= np.linalg.norm(light)
        lum = 0.55 + 0.45 * np.abs(n @ light)
        col = np.clip(col.astype(np.float64) * lum[:, None], 0, 255
                      ).astype(np.uint8)

    focal = 0.5 * height / np.tan(np.deg2rad(fov_deg) * 0.5)
    x = (cam[:, 0] / z) * focal + width * 0.5
    y = -(cam[:, 1] / z) * focal + height * 0.5
    xi = np.round(x).astype(np.int64)
    yi = np.round(y).astype(np.int64)
    inb = (xi >= 0) & (xi < width) & (yi >= 0) & (yi < height)
    if radii is not None:
        size = np.clip(np.round(2.0 * np.asarray(radii, np.float64)[vis]
                                * focal / z), 1, 6).astype(np.int64)[inb]
    else:
        size = np.full(int(inb.sum()), point_px, np.int64)
    xi, yi, z, col = xi[inb], yi[inb], z[inb], col[inb]

    img = np.empty((height, width, 3), np.uint8)
    img[:] = bg
    zbuf = np.full((height, width), np.inf)
    order = np.argsort(-z)  # far to near; nearest written last
    xi, yi, z, col, size = (xi[order], yi[order], z[order], col[order],
                            size[order])
    smax = int(size.max()) if len(size) else 1
    lo = -(size // 2)
    hi = size + lo
    for dy in range(-(smax // 2), smax - smax // 2):
        rowsel = (dy >= lo) & (dy < hi)
        for dx in range(-(smax // 2), smax - smax // 2):
            sel = rowsel & (dx >= lo) & (dx < hi)
            yy = np.clip(yi[sel] + dy, 0, height - 1)
            xx = np.clip(xi[sel] + dx, 0, width - 1)
            img[yy, xx] = col[sel]
            zbuf[yy, xx] = z[sel]
    if edl_strength > 0.0:
        img = apply_edl(img, zbuf, strength=edl_strength)
    if return_zbuf:
        return img, zbuf
    return img


def apply_edl(img: np.ndarray, zbuf: np.ndarray,
              strength: float = 1.0) -> np.ndarray:
    """Eye-Dome Lighting: darken pixels whose neighbors are closer to the
    eye (screen-space log-depth gradient), the shading the reference's GL
    viewer applies to point clouds (cloudvis.h EDL shader)."""
    logz = np.where(np.isfinite(zbuf), np.log(np.maximum(zbuf, 1e-6)), 0.0)
    have = np.isfinite(zbuf)
    acc = np.zeros_like(logz)
    cnt = np.zeros_like(logz)
    for dy, dx in ((0, 1), (0, -1), (1, 0), (-1, 0),
                   (1, 1), (1, -1), (-1, 1), (-1, -1)):
        nz = np.roll(np.roll(logz, dy, 0), dx, 1)
        nh = np.roll(np.roll(have, dy, 0), dx, 1)
        acc += np.where(nh, np.maximum(logz - nz, 0.0), 0.0)
        cnt += nh
    resp = acc / np.maximum(cnt, 1)
    shade = np.exp(-strength * 80.0 * resp)
    out = img.astype(np.float64)
    out[have] *= shade[have][:, None]
    return np.clip(out, 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Debug overlays (the headless counterpart of lib/rs/debugvis.h:4-9 —
# thick lines, grids, axes, proposal bboxes)
# ---------------------------------------------------------------------------

def draw_segments(img: np.ndarray, zbuf: np.ndarray, view: np.ndarray,
                  segments: np.ndarray, colors: np.ndarray,
                  fov_deg: float = 55.0, z_bias: float = 0.01,
                  px: int = 1) -> None:
    """Depth-tested world-space line segments drawn into (img, zbuf).

    segments: (S, 2, 3) endpoints; colors: (S, 3) uint8 or [0,1] float.
    Each segment is sampled at ~pixel density, samples z-tested against the
    point splats with a small bias so lines sitting ON geometry win.
    """
    height, width, _ = img.shape
    segments = np.asarray(segments, np.float64).reshape(-1, 2, 3)
    colors = np.asarray(colors)
    if colors.dtype != np.uint8:
        colors = np.clip(colors * 255.0, 0, 255).astype(np.uint8)
    focal = 0.5 * height / np.tan(np.deg2rad(fov_deg) * 0.5)

    def project(p):
        cam = p @ view[:3, :3].T + view[:3, 3]
        z = -cam[:, 2]
        x = (cam[:, 0] / np.maximum(z, 1e-6)) * focal + width * 0.5
        y = -(cam[:, 1] / np.maximum(z, 1e-6)) * focal + height * 0.5
        return x, y, z

    ax, ay, az = project(segments[:, 0])
    bx, by, bz = project(segments[:, 1])
    # sample counts at ~1 px spacing (camera-clipped segments kept coarse)
    n_samp = np.clip(np.hypot(bx - ax, by - ay).astype(np.int64) + 2,
                     2, 4096)
    xs, ys, zs, cs = [], [], [], []
    for s in range(len(segments)):
        t = np.linspace(0.0, 1.0, n_samp[s])
        p = segments[s, 0][None, :] * (1 - t[:, None]) + \
            segments[s, 1][None, :] * t[:, None]
        x, y, z = project(p)
        ok = z > 1e-4
        xs.append(x[ok])
        ys.append(y[ok])
        zs.append(z[ok])
        cs.append(np.tile(colors[s % len(colors)], (int(ok.sum()), 1)))
    if not xs:
        return
    x = np.concatenate(xs)
    y = np.concatenate(ys)
    z = np.concatenate(zs)
    c = np.concatenate(cs)
    for dy in range(px):
        for dx in range(px):
            xi = np.round(x).astype(np.int64) + dx
            yi = np.round(y).astype(np.int64) + dy
            inb = (xi >= 0) & (xi < width) & (yi >= 0) & (yi < height)
            xi, yi, zi, ci = xi[inb], yi[inb], z[inb], c[inb]
            front = zi <= zbuf[yi, xi] + z_bias
            img[yi[front], xi[front]] = ci[front]


def bbox_segments(bmin: np.ndarray, bmax: np.ndarray,
                  pose: Optional[np.ndarray] = None) -> np.ndarray:
    """The 12 wireframe edges of an (optionally posed) axis-aligned box."""
    bmin = np.asarray(bmin, np.float64)
    bmax = np.asarray(bmax, np.float64)
    c = np.array([[bmin[0], bmin[1], bmin[2]], [bmax[0], bmin[1], bmin[2]],
                  [bmax[0], bmax[1], bmin[2]], [bmin[0], bmax[1], bmin[2]],
                  [bmin[0], bmin[1], bmax[2]], [bmax[0], bmin[1], bmax[2]],
                  [bmax[0], bmax[1], bmax[2]], [bmin[0], bmax[1], bmax[2]]])
    if pose is not None:
        c = c @ np.asarray(pose, np.float64)[:3, :3].T + pose[:3, 3]
    e = [(0, 1), (1, 2), (2, 3), (3, 0), (4, 5), (5, 6), (6, 7), (7, 4),
         (0, 4), (1, 5), (2, 6), (3, 7)]
    return np.stack([np.stack([c[a], c[b]]) for a, b in e])


def grid_segments(bmin, bmax, y: float = 0.0, step: float = 0.5
                  ) -> np.ndarray:
    """Floor grid lines (dbgvis grid, debugvis.h)."""
    xs = np.arange(np.floor(bmin[0] / step) * step, bmax[0] + step, step)
    zs = np.arange(np.floor(bmin[2] / step) * step, bmax[2] + step, step)
    segs = [[[x, y, zs[0]], [x, y, zs[-1]]] for x in xs]
    segs += [[[xs[0], y, z], [xs[-1], y, z]] for z in zs]
    return np.asarray(segs, np.float64)


def axes_segments(origin=(0.0, 0.0, 0.0), length: float = 0.5) -> tuple:
    """World axes (dbgvis axes): returns (segments (3,2,3), colors (3,3))."""
    o = np.asarray(origin, np.float64)
    segs = np.array([[o, o + [length, 0, 0]],
                     [o, o + [0, length, 0]],
                     [o, o + [0, 0, length]]])
    cols = np.array([[230, 60, 60], [60, 220, 60], [70, 110, 255]],
                    np.uint8)
    return segs, cols


def colorize(cloud, mode: str = "rgb") -> np.ndarray:
    """Per-point colors for a level dict: 'rgb' | 'class' | 'instance' |
    'normal' (n*0.5+0.5 — the cloudvis show_normals toggle,
    lib/rs/cloudvis.h:287-291)."""
    if mode == "rgb":
        return cloud["colors"]
    if mode == "class":
        ids = np.clip(cloud["class_ids"], 0, len(NYU40_PALETTE) - 1)
        return NYU40_PALETTE[ids]
    if mode == "instance":
        ids = np.asarray(cloud["instance_ids"]) % len(NYU40_PALETTE)
        return NYU40_PALETTE[ids]
    if mode == "normal":
        return np.asarray(cloud["normals"], np.float64) * 0.5 + 0.5
    raise ValueError(f"unknown color mode {mode}")


def render_rsdb(db, scene_idx: int = -1, mode: str = "instance",
                level: int = 1, width: int = 1024, height: int = 768,
                camera_eye: Optional[Sequence[float]] = None,
                camera_target: Optional[Sequence[float]] = None,
                show_placements: bool = True,
                placement_mode: str = "optimized",
                max_proposals: int = 8,
                show_bboxes: bool = False,
                show_grid: bool = False,
                show_axes: bool = False,
                df_slice_y: Optional[float] = None,
                surfels: bool = False,
                edl_strength: float = 0.0) -> np.ndarray:
    """Render a database scene + placed objects. `placement_mode` mirrors
    the reference viewer's vis modes (apps/rsdb_viewer/main.cpp:81):
    'optimized' draws the arrangement's poses, 'proposals' the top
    `max_proposals` proposals per object, 'identity' the objects at
    canonical pose. `mode` adds 'score': placements colored by the
    diverging cool-warm map of their (proposal/placement) score — the
    reference viewer's score visualization (lib/rs/diverging_map.inl).
    Debug overlays (lib/rs/debugvis.h): placement bbox wireframes, floor
    grid, world axes, and an optional distance-field slice at height
    ``df_slice_y`` (ops/distance_field, colored by the same diverging
    map)."""
    scene = db.scenes[scene_idx].cloud
    L = scene.levels[level]
    pts = [L["positions"]]
    if mode == "score":
        # scene stays neutral gray; placements carry the score colors
        cols = [np.full((len(L["positions"]), 3), 0.55, np.float64)]
    else:
        cols = [colorize(L, mode)]
    nrms = [L["normals"]]
    rads = [L["radii"]]

    def placements():
        arr_idx = scene_idx if scene_idx >= 0 else len(db.arrangements) - 1
        if placement_mode == "optimized":
            for p in db.arrangements[arr_idx]:
                yield p.object_idx, p.pose, p.uidx, p.score
        elif placement_mode == "proposals":
            poses = ((db.proposed_poses[arr_idx] or [])
                     if db.proposed_poses else [])
            scores = ((db.proposed_scores[arr_idx] or [])
                      if db.proposed_scores else [])
            for oi, obj_poses in enumerate(poses):
                sc = scores[oi] if oi < len(scores) else None
                for k in range(min(len(obj_poses), max_proposals)):
                    s = float(sc[k]) if sc is not None and k < len(sc) else 0.0
                    yield oi, np.asarray(obj_poses[k]), \
                        db.objects[oi].uidx, s
        elif placement_mode == "identity":
            for oi, o in enumerate(db.objects):
                yield oi, np.eye(4, dtype=np.float32), o.uidx, 1.0
        else:
            raise ValueError(f"unknown placement_mode {placement_mode}")

    overlay_boxes = []    # (segments, color float [0,1])
    if show_placements:
        for object_idx, pose, uidx, score in placements():
            obj = db.objects[object_idx].cloud
            if obj is None:
                continue
            Lo = obj.levels[level]
            w = Lo["positions"] @ pose[:3, :3].T + pose[:3, 3]
            pts.append(w)
            if mode == "score":
                c = diverging_colors(np.clip(score, 0.0, 1.0))
                cols.append(np.tile(c, (len(w), 1)))
            else:
                fake = dict(Lo)
                fake["instance_ids"] = np.full(len(w), uidx, np.int32)
                cols.append(colorize(fake, mode))
            nrms.append(Lo["normals"] @ pose[:3, :3].T)
            rads.append(Lo["radii"])
            if show_bboxes:
                bmin_o = Lo["positions"].min(axis=0)
                bmax_o = Lo["positions"].max(axis=0)
                c = (diverging_colors(np.clip(score, 0.0, 1.0))
                     if mode == "score" else
                     NYU40_PALETTE[uidx % len(NYU40_PALETTE)] / 255.0)
                overlay_boxes.append((bbox_segments(bmin_o, bmax_o, pose),
                                      np.asarray(c, np.float64)))

    if df_slice_y is not None:
        # distance-field debug slice: sample a horizontal plane through the
        # scene's field, color by distance via the diverging map
        from ..ops import distance_field as dfmod
        df = dfmod.build_distance_field(scene.pos(2), voxel=0.05,
                                        max_dist=0.5)
        bmin_s, bmax_s = scene.bbox
        gx = np.arange(bmin_s[0], bmax_s[0], 0.02)
        gz = np.arange(bmin_s[2], bmax_s[2], 0.02)
        gxx, gzz = np.meshgrid(gx, gz, indexing="ij")
        slice_pts = np.stack([gxx.ravel(),
                              np.full(gxx.size, df_slice_y),
                              gzz.ravel()], axis=1).astype(np.float32)
        d = np.asarray(df.lookup(slice_pts))
        pts.append(slice_pts)
        cols.append(diverging_colors(1.0 - np.clip(d / 0.5, 0, 1)))
        nrms.append(np.tile(np.array([[0, 1, 0]], np.float64),
                            (len(slice_pts), 1)))
        rads.append(np.full(len(slice_pts), 0.01, np.float32))

    pts = np.concatenate(pts)
    cols = np.concatenate([np.asarray(c, np.float64) / (255.0 if
                          np.asarray(c).dtype == np.uint8 else 1.0)
                          for c in cols])
    nrms = np.concatenate(nrms)

    bmin, bmax = pts.min(0), pts.max(0)
    center = (bmin + bmax) / 2
    diag = float(np.linalg.norm(bmax - bmin))
    eye = (np.asarray(camera_eye, np.float64) if camera_eye is not None
           else center + np.array([0.65, 0.9, 0.75]) * diag)
    target = (np.asarray(camera_target, np.float64)
              if camera_target is not None else center)
    view = look_at(eye, target)
    img, zbuf = render_points(pts, cols, view, width, height,
                              shade_normals=nrms,
                              radii=np.concatenate(rads) if surfels else None,
                              edl_strength=edl_strength, return_zbuf=True)
    if show_grid:
        segs = grid_segments(bmin, bmax, y=float(bmin[1]))
        draw_segments(img, zbuf, view, segs,
                      np.full((len(segs), 3), 90, np.uint8))
    if show_axes:
        segs, axcols = axes_segments(origin=bmin, length=0.25 * diag)
        draw_segments(img, zbuf, view, segs, axcols, px=2)
    for segs, c in overlay_boxes:
        draw_segments(img, zbuf, view, segs,
                      np.tile(np.asarray(c).reshape(1, 3), (len(segs), 1)),
                      px=2)
    return img
