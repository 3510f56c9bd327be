"""TSDF fusion + texture export tests on analytic geometry."""

from pathlib import Path

import numpy as np
import pytest

from gfnerf_tpu.exporter.exporter import (
    export_textured_mesh,
    export_tsdf_mesh,
    integrate_tsdf,
)
from gfnerf_tpu.utils.synthetic import ring_cameras


def _render_sphere_depth(cams, i, downscale=1, radius=1.0):
    """Analytic depth render of a unit sphere at the origin."""
    c2w = np.asarray(cams.camera_to_worlds[i])
    fx = cams.fx[i] / downscale
    fy = cams.fy[i] / downscale
    cx = cams.cx[i] / downscale
    cy = cams.cy[i] / downscale
    w = int(cams.width[i]) // downscale
    h = int(cams.height[i]) // downscale
    yy, xx = np.meshgrid(np.arange(h) + 0.5, np.arange(w) + 0.5,
                         indexing="ij")
    d_cam = np.stack([(xx - cx) / fx, -(yy - cy) / fy, -np.ones_like(xx)],
                     -1)
    d = d_cam @ c2w[:3, :3].T
    norm = np.linalg.norm(d, axis=-1)
    d = d / norm[..., None]
    o = c2w[:3, 3]
    b = d @ o
    c = float(o @ o - radius * radius)
    disc = b * b - c
    t = -b - np.sqrt(np.maximum(disc, 0))
    hit = (disc > 0) & (t > 0)
    # depth convention: distance along -z_cam == t * (d . view_z)... the
    # exporter compares against voxel camera-z, so store ray-z depth
    zdir = -c2w[:3, 2]
    depth = t * (d @ zdir)
    depth = np.where(hit, depth, 0.0)
    rgb = np.zeros((h, w, 3), np.float32)
    rgb[..., 0] = np.where(hit, 1.0, 0.0)
    return {"depth": depth[..., None].astype(np.float32), "rgb": rgb}


def test_tsdf_sphere(tmp_path):
    c2w, fx, fy, cx, cy, w, h = ring_cameras(12, radius=3.0, height=0.5,
                                             img_wh=(64, 48), focal=60.0)
    from gfnerf_tpu.data.dataparsers.base import CamerasHost

    cams = CamerasHost(camera_to_worlds=c2w, fx=fx, fy=fy, cx=cx, cy=cy,
                       width=np.full(12, w, np.int32),
                       height=np.full(12, h, np.int32))

    def render_fn(cams_, i, downscale=1):
        return _render_sphere_depth(cams_, i, downscale)

    aabb = np.array([[-1.6] * 3, [1.6] * 3])
    out = tmp_path / "tsdf.obj"
    n = export_tsdf_mesh(render_fn, cams, aabb, resolution=32,
                         output_path=out, downscale=1)
    assert n > 50
    verts = np.asarray([[float(x) for x in l.split()[1:4]]
                        for l in out.read_text().splitlines()
                        if l.startswith("v ")])
    radii = np.linalg.norm(verts, axis=-1)
    # fused surface should hug the unit sphere
    assert 0.8 < np.median(radii) < 1.2
    assert np.abs(radii - 1.0).mean() < 0.25


def test_integrate_tsdf_signs():
    """Voxels in front of the observed depth get positive tsdf, behind get
    truncated negative."""
    dims = (8, 8, 8)
    origin = np.array([-1.0, -1.0, -3.0])
    vs = np.array([0.25, 0.25, 0.25])
    c2w = np.eye(4)[:3]          # camera at origin looking down -z
    K = np.array([[50.0, 0, 16], [0, 50, 16], [0, 0, 1]])
    depth = np.full((32, 32), 2.5, np.float32)
    tsdf, weights, colors = integrate_tsdf(origin, vs, dims, c2w, K, depth)
    assert weights.sum() > 0
    # voxel near z=-2 (depth 2 < 2.5) -> in front -> positive
    grid_z = origin[2] + (np.arange(8) + 0.5) * vs[2]
    front = np.argmin(np.abs(grid_z + 2.0))
    assert tsdf[4, 4, front] > 0


def test_textured_mesh(tmp_path):
    pytest.importorskip("cv2")
    verts = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]],
                     np.float32)
    faces = np.array([[0, 1, 2, 3]])

    def render_rays_fn(o, d):
        # color encodes x coordinate of the hit point (origin offset along z)
        return np.stack([o[:, 0], o[:, 1], np.zeros(len(o))], -1)

    out = export_textured_mesh(verts, faces, render_rays_fn, tmp_path,
                               texture_px_per_face=4)
    assert out.exists()
    assert (tmp_path / "texture.png").exists()
    assert (tmp_path / "material.mtl").exists()
    txt = out.read_text()
    assert "vt " in txt and "mtllib" in txt
