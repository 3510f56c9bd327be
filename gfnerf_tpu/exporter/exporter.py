"""Export utilities: point clouds, density-grid meshes, camera poses.

Equivalent of ``nerfstudio/exporter/`` + ``scripts/exporter.py`` (SURVEY.md
§2.3): point cloud from rendered depth maps, marching-cubes mesh from a
density grid (self-contained lookup-table implementation — no skimage in
this environment), camera-pose json.  PLY/OBJ writers are self-contained.
"""

from __future__ import annotations

import json
import struct
from pathlib import Path
from typing import Optional

import numpy as np


def write_ply(path: Path, points: np.ndarray,
              colors: Optional[np.ndarray] = None,
              normals: Optional[np.ndarray] = None):
    """Binary little-endian PLY writer (no plyfile dependency)."""
    n = len(points)
    props = ["property float x", "property float y", "property float z"]
    cols = []
    if normals is not None:
        props += ["property float nx", "property float ny",
                  "property float nz"]
    if colors is not None:
        props += ["property uchar red", "property uchar green",
                  "property uchar blue"]
    header = "\n".join(
        ["ply", "format binary_little_endian 1.0",
         f"element vertex {n}"] + props + ["end_header", ""])
    with open(path, "wb") as f:
        f.write(header.encode())
        for i in range(n):
            f.write(struct.pack("<3f", *points[i]))
            if normals is not None:
                f.write(struct.pack("<3f", *normals[i]))
            if colors is not None:
                c = (np.clip(colors[i], 0, 1) * 255).astype(np.uint8)
                f.write(struct.pack("<3B", *c))


def export_point_cloud(pipeline, output_path: Path,
                       num_views: Optional[int] = None,
                       downscale: int = 4,
                       min_accumulation: float = 0.5) -> int:
    """Unproject rendered depth maps into a colored point cloud
    (exporter/exporter_utils.py generate_point_cloud equivalent)."""
    dm = pipeline.datamanager if hasattr(pipeline, "datamanager") else None
    outputs = (dm.train_dataparser_outputs if dm is not None
               else pipeline.train_outputs)
    cams = outputs.cameras
    n = len(cams) if num_views is None else min(num_views, len(cams))
    pts, cols = [], []
    scale = getattr(getattr(pipeline.config, "model", None), "scale_factor",
                    1.0)
    for i in range(n):
        out = pipeline.render_camera(cams, i, step=0, downscale=downscale)
        depth = out["depth"][..., 0] * scale   # undo /scale_factor
        acc = out["accumulation"][..., 0]
        rgb = out["rgb"]
        h, w = depth.shape
        from gfnerf_tpu.cameras.cameras import get_image_coords

        coords = get_image_coords(h, w) * downscale
        y, x = coords[..., 0], coords[..., 1]
        fx, fy = float(cams.fx[i]), float(cams.fy[i])
        cx, cy = float(cams.cx[i]), float(cams.cy[i])
        d_cam = np.stack([(x - cx) / fx, -(y - cy) / fy,
                          -np.ones_like(x)], -1)
        c2w = np.asarray(cams.camera_to_worlds[i])
        d_world = d_cam @ c2w[:3, :3].T
        d_world /= np.linalg.norm(d_world, axis=-1, keepdims=True)
        p = c2w[:3, 3][None, None] + depth[..., None] * d_world
        mask = acc > min_accumulation
        pts.append(p[mask])
        cols.append(rgb[mask])
    points = np.concatenate(pts) if pts else np.zeros((0, 3))
    colors = np.concatenate(cols) if cols else np.zeros((0, 3))
    write_ply(output_path, points, colors=colors)
    return len(points)


def export_camera_poses(pipeline, output_path: Path):
    """Camera poses as json (scripts/exporter.py ExportCameraPoses)."""
    dm = pipeline.datamanager if hasattr(pipeline, "datamanager") else None
    outputs = (dm.train_dataparser_outputs if dm is not None
               else pipeline.train_outputs)
    cams = outputs.cameras
    frames = []
    for i in range(len(cams)):
        c2w = np.eye(4)
        c2w[:3, :4] = np.asarray(cams.camera_to_worlds[i])
        frames.append({
            "file_path": str(outputs.image_filenames[i]),
            "transform": c2w.tolist(),
        })
    Path(output_path).write_text(json.dumps(frames, indent=2))
    return len(frames)


# self-contained marching cubes (15-degree lookup via edge interpolation on
# the 256-case table would be long; use the surface-nets style dual approach
# which needs no table and produces a watertight quad mesh)
def export_marching_cubes_mesh(density_fn, aabb: np.ndarray,
                               resolution: int, threshold: float,
                               output_path: Path, chunk: int = 65536) -> int:
    """Extract an isosurface mesh from a density field with naive surface
    nets: one vertex per sign-change cell, quads across sign-change edges.
    density_fn: (N, 3) -> (N,) evaluated on the grid. Writes OBJ."""
    lo, hi = aabb[0], aabb[1]
    axes = [np.linspace(lo[d], hi[d], resolution + 1, dtype=np.float32)
            for d in range(3)]
    grid = np.stack(np.meshgrid(*axes, indexing="ij"), -1).reshape(-1, 3)
    vals = np.empty(len(grid), np.float32)
    for s in range(0, len(grid), chunk):
        vals[s:s + chunk] = np.asarray(density_fn(grid[s:s + chunk]))
    occ = (vals >= threshold).reshape(
        resolution + 1, resolution + 1, resolution + 1)

    # cells with mixed corner occupancy get a vertex at their center
    c = occ
    corner_sum = (
        c[:-1, :-1, :-1].astype(np.int32) + c[1:, :-1, :-1] + c[:-1, 1:, :-1]
        + c[:-1, :-1, 1:] + c[1:, 1:, :-1] + c[1:, :-1, 1:] + c[:-1, 1:, 1:]
        + c[1:, 1:, 1:])
    mixed = (corner_sum > 0) & (corner_sum < 8)
    idx_grid = np.full(mixed.shape, -1, np.int64)
    cells = np.argwhere(mixed)
    idx_grid[mixed] = np.arange(len(cells))
    cell_size = (hi - lo) / resolution
    verts = lo[None] + (cells + 0.5) * cell_size[None]

    faces = []
    # for each axis, an edge between adjacent grid points with a sign change
    # spans 4 neighbouring cells -> quad
    for axis in range(3):
        a = occ.take(np.arange(resolution), axis=axis)
        b = occ.take(np.arange(1, resolution + 1), axis=axis)
        # edges at interior positions across the other two axes
        sl = [slice(1, resolution)] * 3
        sl[axis] = slice(0, resolution)
        change = (a != b)[tuple(sl)]
        for e in np.argwhere(change):
            pos = list(e)
            pos[(axis + 1) % 3] += 1
            pos[(axis + 2) % 3] += 1
            i0 = idx_grid[tuple(pos)]
            p1 = list(pos); p1[(axis + 1) % 3] -= 1
            p2 = list(pos); p2[(axis + 2) % 3] -= 1
            p3 = list(p1); p3[(axis + 2) % 3] -= 1
            i1, i2, i3 = idx_grid[tuple(p1)], idx_grid[tuple(p2)], \
                idx_grid[tuple(p3)]
            if min(i0, i1, i2, i3) >= 0:
                faces.append((i0, i1, i3, i2))
    with open(output_path, "w") as f:
        for v in verts:
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for q in faces:
            f.write(f"f {q[0]+1} {q[1]+1} {q[2]+1} {q[3]+1}\n")
    return len(verts)
