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
def integrate_tsdf(voxel_origin, voxel_size, dims, c2w, K, depth, color=None,
                   tsdf=None, weights=None, colors=None,
                   truncation_margin: float = 5.0):
    """Projective TSDF integration of one depth (+color) image
    (reference exporter/tsdf_utils.py:170-273): project every voxel into the
    camera, bilinear-free nearest-depth lookup, truncated signed distance
    ``(depth - voxel_z) / trunc`` clamped to [-1, 1], running weighted
    average of values and colors."""
    nx, ny, nz = dims
    if tsdf is None:
        tsdf = np.ones(dims, np.float32)
        weights = np.zeros(dims, np.float32)
        colors = np.zeros((*dims, 3), np.float32)
    grid = np.stack(np.meshgrid(np.arange(nx), np.arange(ny), np.arange(nz),
                                indexing="ij"), -1).reshape(-1, 3)
    pts = voxel_origin[None] + (grid + 0.5) * voxel_size[None]
    w2c = np.linalg.inv(np.concatenate(
        [c2w, [[0, 0, 0, 1]]], axis=0) if c2w.shape[0] == 3 else c2w)
    cam = (w2c[:3, :3] @ pts.T + w2c[:3, 3:4]).T       # (N, 3)
    z = -cam[:, 2]                                     # -z forward
    uv = (K @ np.stack([cam[:, 0], -cam[:, 1], z], 0)).T
    with np.errstate(divide="ignore", invalid="ignore"):
        u = uv[:, 0] / uv[:, 2]
        v = uv[:, 1] / uv[:, 2]
    h, w = depth.shape[:2]
    ui = np.clip(u, 0, w - 1).astype(np.int32)
    vi = np.clip(v, 0, h - 1).astype(np.int32)
    valid = (z > 0) & (u >= 0) & (u < w) & (v >= 0) & (v < h)
    d_img = depth[vi, ui]
    valid &= d_img > 0
    trunc = truncation_margin * float(voxel_size[0])
    sdf = np.clip((d_img - z) / trunc, -1.0, 1.0)
    upd = valid & (sdf > -1.0)
    sdf = np.where(upd, sdf, 0.0)
    wnew = upd.astype(np.float32)
    tsdf_f = tsdf.reshape(-1)
    w_f = weights.reshape(-1)
    c_f = colors.reshape(-1, 3)
    wsum = w_f + wnew
    safe = np.maximum(wsum, 1e-9)
    tsdf_f[:] = np.where(upd, (tsdf_f * w_f + sdf * wnew) / safe, tsdf_f)
    if color is not None:
        cimg = color[vi, ui]
        c_f[:] = np.where(upd[:, None],
                          (c_f * w_f[:, None] + cimg * wnew[:, None])
                          / safe[:, None], c_f)
    w_f[:] = wsum
    return tsdf, weights, colors


def export_tsdf_mesh(render_camera_fn, cameras, aabb: np.ndarray,
                     resolution: int, output_path: Path,
                     downscale: int = 4, num_views: int = None) -> int:
    """TSDF-fusion mesh export (reference exporter/tsdf_utils.py:274-340):
    render depth+rgb from the training cameras, fuse into a voxel TSDF,
    extract the zero crossing with the surface-nets extractor, write OBJ
    with per-vertex colors."""
    lo, hi = np.asarray(aabb[0], np.float64), np.asarray(aabb[1], np.float64)
    dims = (resolution,) * 3
    voxel_size = (hi - lo) / resolution
    tsdf = weights = colors = None
    n = len(cameras) if num_views is None else min(num_views, len(cameras))
    step = max(len(cameras) // n, 1)
    for i in range(0, len(cameras), step):
        out = render_camera_fn(cameras, i, downscale=downscale)
        depth = np.asarray(out["depth"])[..., 0]
        rgb = np.asarray(out["rgb"])
        K = np.array([[cameras.fx[i] / downscale, 0,
                       cameras.cx[i] / downscale],
                      [0, cameras.fy[i] / downscale,
                       cameras.cy[i] / downscale],
                      [0, 0, 1]], np.float64)
        tsdf, weights, colors = integrate_tsdf(
            lo, voxel_size, dims, np.asarray(cameras.camera_to_worlds[i]),
            K, depth, rgb, tsdf, weights, colors)
    observed = weights > 0
    field = np.where(observed, tsdf, 1.0)

    # zero-crossing surface via the same surface-nets scheme as the density
    # mesh, on -tsdf (inside = positive)
    def fn(pts):
        ijk = np.clip(((pts - lo[None]) / voxel_size[None] - 0.5), 0,
                      resolution - 1).astype(np.int32)
        return -field[ijk[:, 0], ijk[:, 1], ijk[:, 2]]

    n_verts = export_marching_cubes_mesh(fn, np.stack([lo, hi]),
                                         resolution - 1, 0.0, output_path)
    return n_verts


def export_textured_mesh(verts: np.ndarray, faces: np.ndarray,
                         render_rays_fn, output_dir: Path,
                         texture_px_per_face: int = 8,
                         offset: float = 0.05) -> Path:
    """Texture a mesh by giving every face its own square texture patch
    (the reference's per-UV-triangle unwrap, exporter/texture_utils.py:
    82-216, with quad faces): texel colors come from rendering short rays
    toward the surface along the face normal, exactly how the reference
    queries the radiance field for texture. Writes OBJ + MTL + PNG atlas."""
    import cv2

    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    f = np.asarray(faces)
    v = np.asarray(verts)
    nf = len(f)
    ps = texture_px_per_face
    atlas_cols = int(np.ceil(np.sqrt(nf)))
    atlas_rows = int(np.ceil(nf / atlas_cols))
    tex = np.zeros((atlas_rows * ps, atlas_cols * ps, 3), np.float32)

    # face normals (quads assumed planar enough)
    e1 = v[f[:, 1]] - v[f[:, 0]]
    e2 = v[f[:, 3 if f.shape[1] == 4 else 2]] - v[f[:, 0]]
    nrm = np.cross(e1, e2)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True) + 1e-12

    uu, vv = np.meshgrid((np.arange(ps) + 0.5) / ps,
                         (np.arange(ps) + 0.5) / ps, indexing="xy")
    uu, vv = uu.reshape(-1), vv.reshape(-1)
    origins, dirs, slots = [], [], []
    for fi in range(nf):
        quad = f[fi]
        if f.shape[1] == 4:
            p = ((1 - uu)[:, None] * ((1 - vv)[:, None] * v[quad[0]]
                                      + vv[:, None] * v[quad[3]])
                 + uu[:, None] * ((1 - vv)[:, None] * v[quad[1]]
                                  + vv[:, None] * v[quad[2]]))
        else:
            w0 = np.clip(1 - uu - vv, 0, None)
            p = (w0[:, None] * v[quad[0]] + uu[:, None] * v[quad[1]]
                 + vv[:, None] * v[quad[2]])
        origins.append(p + offset * nrm[fi])
        dirs.append(np.tile(-nrm[fi], (len(p), 1)))
        slots.append(np.full(len(p), fi))
    origins = np.concatenate(origins)
    dirs = np.concatenate(dirs)
    slots = np.concatenate(slots)
    rgb = np.asarray(render_rays_fn(origins, dirs))    # (N, 3)
    for fi in range(nf):
        sel = slots == fi
        r, c = divmod(fi, atlas_cols)
        tex[r * ps:(r + 1) * ps, c * ps:(c + 1) * ps] = (
            rgb[sel].reshape(ps, ps, 3))

    cv2.imwrite(str(output_dir / "texture.png"),
                (np.clip(tex[::-1], 0, 1) * 255).astype(np.uint8)[..., ::-1])
    (output_dir / "material.mtl").write_text(
        "newmtl textured\nmap_Kd texture.png\n")
    obj = ["mtllib material.mtl", "usemtl textured"]
    for p in v:
        obj.append(f"v {p[0]} {p[1]} {p[2]}")
    th, tw = atlas_rows * ps, atlas_cols * ps
    for fi in range(nf):
        r, c = divmod(fi, atlas_cols)
        x0, y0 = c * ps / tw, r * ps / th
        x1, y1 = (c + 1) * ps / tw, (r + 1) * ps / th
        for (x, y) in ((x0, y0), (x1, y0), (x1, y1), (x0, y1)):
            obj.append(f"vt {x} {y}")
    for fi, quad in enumerate(f):
        t0 = 4 * fi + 1
        if f.shape[1] == 4:
            obj.append(
                f"f {quad[0]+1}/{t0} {quad[1]+1}/{t0+1} "
                f"{quad[2]+1}/{t0+2} {quad[3]+1}/{t0+3}")
        else:
            obj.append(f"f {quad[0]+1}/{t0} {quad[1]+1}/{t0+1} "
                       f"{quad[2]+1}/{t0+2}")
    out_path = output_dir / "mesh.obj"
    out_path.write_text("\n".join(obj) + "\n")
    return out_path


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
