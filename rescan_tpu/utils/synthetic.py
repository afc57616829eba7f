"""Synthetic indoor-scene generator for tests and benchmarks.

The Rescan dataset is not bundled, so tests and benchmarks exercise the
pipeline on procedurally generated rooms: a floor + four walls plus a set of
box "furniture" objects with per-vertex class / instance labels — the same
label conventions as the reference data (NYU40 class ids; GT instance ids).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Tuple

import numpy as np

# NYU40 class table as used by the pipeline's nyu40_classes.txt seed file:
# index 0 is "unlabelled", 1..40 the NYU40 classes
# (scripts/evaluate_instance_transfer.py:40).
NYU40_CLASSES = [
    "unlabelled", "wall", "floor", "cabinet", "bed", "chair", "sofa", "table",
    "door", "window", "bookshelf", "picture", "counter", "blinds", "desk",
    "shelves", "curtain", "dresser", "pillow", "mirror", "floor_mat",
    "clothes", "ceiling", "books", "refridgerator", "television", "paper",
    "towel", "shower_curtain", "box", "whiteboard", "person", "night_stand",
    "toilet", "sink", "lamp", "bathtub", "bag", "otherstructure",
    "otherfurniture", "otherprop",
]


def write_class_file(path: str) -> None:
    """Write an nyu40_classes.txt seed file (parsed by the rsdb loader as
    'class <name> <idx>' lines; run_segmentation_pipeline.py:23)."""
    with open(path, "w") as f:
        for idx, name in enumerate(NYU40_CLASSES):
            f.write(f"class {name} {idx}\n")


def _grid_plane(origin, du, dv, nu, nv):
    """Triangulated planar patch: returns (verts, faces)."""
    origin = np.asarray(origin, dtype=np.float32)
    du = np.asarray(du, dtype=np.float32)
    dv = np.asarray(dv, dtype=np.float32)
    us, vs = np.meshgrid(np.arange(nu + 1), np.arange(nv + 1), indexing="ij")
    verts = (origin[None, :] + us.reshape(-1, 1) * du[None, :]
             + vs.reshape(-1, 1) * dv[None, :])
    idx = np.arange((nu + 1) * (nv + 1)).reshape(nu + 1, nv + 1)
    a = idx[:-1, :-1].ravel()
    b = idx[1:, :-1].ravel()
    c = idx[1:, 1:].ravel()
    d = idx[:-1, 1:].ravel()
    faces = np.concatenate([np.stack([a, b, c], 1), np.stack([a, c, d], 1)], 0)
    return verts.astype(np.float32), faces.astype(np.int32)


def _box(center, size, res=4):
    """Triangulated axis-aligned box."""
    cx, cy, cz = center
    sx, sy, sz = size
    o = np.array([cx - sx / 2, cy - sy / 2, cz - sz / 2], dtype=np.float32)
    verts_all, faces_all = [], []
    quads = [
        (o, [sx, 0, 0], [0, sy, 0]),                       # z- face
        (o + [0, 0, sz], [0, sy, 0], [sx, 0, 0]),          # z+ face
        (o, [0, 0, sz], [sx, 0, 0]),                       # y- face
        (o + [0, sy, 0], [sx, 0, 0], [0, 0, sz]),          # y+ face
        (o, [0, sy, 0], [0, 0, sz]),                       # x- face
        (o + [sx, 0, 0], [0, 0, sz], [0, sy, 0]),          # x+ face
    ]
    n = 0
    for origin, du, dv in quads:
        v, f = _grid_plane(np.asarray(origin, np.float32),
                           np.asarray(du, np.float32) / res,
                           np.asarray(dv, np.float32) / res, res, res)
        verts_all.append(v)
        faces_all.append(f + n)
        n += len(v)
    return np.concatenate(verts_all), np.concatenate(faces_all)


@dataclasses.dataclass
class SceneSpec:
    """Furniture layout: list of (class_name, center_xz, size, y_rotation)."""
    room_size: Tuple[float, float] = (4.0, 4.0)
    wall_height: float = 2.5
    objects: List[Tuple[str, Tuple[float, float], Tuple[float, float, float], float]] = \
        dataclasses.field(default_factory=list)


def default_scene_spec() -> SceneSpec:
    return SceneSpec(objects=[
        ("chair", (1.0, 1.0), (0.5, 0.9, 0.5), 0.0),
        ("table", (2.5, 2.0), (1.2, 0.75, 0.8), 0.0),
        ("sofa", (1.0, 3.0), (1.6, 0.8, 0.7), 0.0),
    ])


def make_scene_mesh(spec: SceneSpec, resolution: int = 24,
                    jitter: float = 0.0, seed: int = 0
                    ) -> Dict[str, np.ndarray]:
    """Build a labelled room mesh. Returns surfel-cloud dict + faces.

    Instance-id convention of GT scans: walls/floor get small fixed ids,
    dynamic furniture gets ids 3, 4, 5, ...
    """
    rng = np.random.default_rng(seed)
    w, d = spec.room_size
    h = spec.wall_height
    parts = []  # (verts, faces, class_name, instance_id)

    # winding chosen so the floor normal points +y (toward the scanner),
    # matching real scan data
    fv, ff = _grid_plane([0, 0, 0], [0, 0, d / resolution],
                         [w / resolution, 0, 0], resolution, resolution)
    parts.append((fv, ff, "floor", 0))
    wall_res = max(resolution // 2, 2)
    walls = [
        ([0, 0, 0], [w, 0, 0], [0, h, 0]),
        ([0, 0, d], [w, 0, 0], [0, h, 0]),
        ([0, 0, 0], [0, 0, d], [0, h, 0]),
        ([w, 0, 0], [0, 0, d], [0, h, 0]),
    ]
    for i, (o, du, dv) in enumerate(walls):
        vv, vf = _grid_plane(np.asarray(o, np.float32),
                             np.asarray(du, np.float32) / wall_res,
                             np.asarray(dv, np.float32) / wall_res,
                             wall_res, wall_res)
        parts.append((vv, vf, "wall", 1))

    for k, (cls, (cx, cz), size, rot) in enumerate(spec.objects):
        bv, bf = _box((0.0, size[1] / 2, 0.0), size, res=max(resolution // 6, 2))
        c, s = np.cos(rot), np.sin(rot)
        R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], dtype=np.float32)
        bv = bv @ R.T + np.array([cx, 0.0, cz], dtype=np.float32)
        parts.append((bv, bf, cls, 3 + k))

    verts, faces, classes, instances = [], [], [], []
    n = 0
    for vv, vf, cls, inst in parts:
        verts.append(vv)
        faces.append(vf + n)
        classes.append(np.full(len(vv), NYU40_CLASSES.index(cls), np.int32))
        instances.append(np.full(len(vv), inst, np.int32))
        n += len(vv)
    verts = np.concatenate(verts)
    if jitter > 0:
        verts = verts + rng.normal(0, jitter, verts.shape).astype(np.float32)
    faces = np.concatenate(faces)
    classes = np.concatenate(classes)
    instances = np.concatenate(instances)
    colors = (0.2 + 0.6 * (classes[:, None] % np.array([3, 5, 7])) /
              np.array([3, 5, 7])).astype(np.float32)
    return {
        "positions": verts,
        "faces": faces,
        "class_ids": classes,
        "instance_ids": instances,
        "colors": colors,
        "radii": np.full(len(verts), 0.01, np.float32),
        "qualities": np.ones(len(verts), np.float32),
    }


def save_scene_ply(path: str, spec: SceneSpec, resolution: int = 24,
                   jitter: float = 0.0, seed: int = 0) -> Dict[str, np.ndarray]:
    """Write a synthetic GT scan as a mesh PLY (with class/instance fields)."""
    from ..io import ply as plyio
    mesh = make_scene_mesh(spec, resolution, jitter, seed)
    nrm = plyio.compute_vertex_normals(mesh["positions"], mesh["faces"])
    cloud = dict(mesh)
    cloud["normals"] = nrm
    plyio.save_surfel_ply(path, cloud, faces=mesh["faces"])
    return cloud


def moved_scene_spec(spec: SceneSpec, move: Tuple[float, float] = (0.6, 0.3),
                     which: int = 0, rot: float = 0.0) -> SceneSpec:
    """A rescan: same room, object ``which`` translated by ``move`` (xz)."""
    objs = []
    for i, (cls, (cx, cz), size, r) in enumerate(spec.objects):
        if i == which:
            objs.append((cls, (cx + move[0], cz + move[1]), size, r + rot))
        else:
            objs.append((cls, (cx, cz), size, r))
    return SceneSpec(spec.room_size, spec.wall_height, objs)
