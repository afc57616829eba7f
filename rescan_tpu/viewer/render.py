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
                  shade_normals: Optional[np.ndarray] = None) -> np.ndarray:
    """Z-buffered point splatting. colors in [0,1] float or uint8."""
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
    xi, yi, z, col = xi[inb], yi[inb], z[inb], col[inb]

    img = np.empty((height, width, 3), np.uint8)
    img[:] = bg
    zbuf = np.full((height, width), np.inf)
    order = np.argsort(-z)  # far to near; nearest written last
    xi, yi, z, col = xi[order], yi[order], z[order], col[order]
    for dy in range(point_px):
        for dx in range(point_px):
            yy = np.clip(yi + dy - point_px // 2, 0, height - 1)
            xx = np.clip(xi + dx - point_px // 2, 0, width - 1)
            img[yy, xx] = col
            zbuf[yy, xx] = z
    return img


def colorize(cloud, mode: str = "rgb") -> np.ndarray:
    """Per-point colors for a level dict: 'rgb' | 'class' | 'instance'."""
    if mode == "rgb":
        return cloud["colors"]
    if mode == "class":
        ids = np.clip(cloud["class_ids"], 0, len(NYU40_PALETTE) - 1)
        return NYU40_PALETTE[ids]
    if mode == "instance":
        ids = np.asarray(cloud["instance_ids"]) % len(NYU40_PALETTE)
        return NYU40_PALETTE[ids]
    raise ValueError(f"unknown color mode {mode}")


def render_rsdb(db, scene_idx: int = -1, mode: str = "instance",
                level: int = 1, width: int = 1024, height: int = 768,
                camera_eye: Optional[Sequence[float]] = None,
                camera_target: Optional[Sequence[float]] = None,
                show_placements: bool = True,
                placement_mode: str = "optimized") -> np.ndarray:
    """Render a database scene + placed objects. `placement_mode` mirrors
    the reference viewer's vis modes (apps/rsdb_viewer/main.cpp:81):
    'optimized' draws the arrangement's poses, 'proposals' the top proposal
    per object, 'identity' the objects at canonical pose."""
    scene = db.scenes[scene_idx].cloud
    L = scene.levels[level]
    pts = [L["positions"]]
    cols = [colorize(L, mode)]
    nrms = [L["normals"]]

    def placements():
        arr_idx = scene_idx if scene_idx >= 0 else len(db.arrangements) - 1
        if placement_mode == "optimized":
            for p in db.arrangements[arr_idx]:
                yield p.object_idx, p.pose, p.uidx
        elif placement_mode == "proposals":
            poses = ((db.proposed_poses[arr_idx] or [])
                     if db.proposed_poses else [])
            for oi, obj_poses in enumerate(poses):
                if len(obj_poses):
                    yield oi, np.asarray(obj_poses[0]), db.objects[oi].uidx
        elif placement_mode == "identity":
            for oi, o in enumerate(db.objects):
                yield oi, np.eye(4, dtype=np.float32), o.uidx
        else:
            raise ValueError(f"unknown placement_mode {placement_mode}")

    if show_placements:
        for object_idx, pose, uidx in placements():
            obj = db.objects[object_idx].cloud
            if obj is None:
                continue
            Lo = obj.levels[level]
            w = Lo["positions"] @ pose[:3, :3].T + pose[:3, 3]
            pts.append(w)
            fake = dict(Lo)
            fake["instance_ids"] = np.full(len(w), uidx, np.int32)
            cols.append(colorize(fake, mode))
            nrms.append(Lo["normals"] @ pose[:3, :3].T)
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
    return render_points(pts, cols, view, width, height,
                         shade_normals=nrms)
