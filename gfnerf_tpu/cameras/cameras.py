"""Camera model and ray generation in pure JAX.

Equivalent of ``nerfstudio/cameras/cameras.py`` (the reference's L6b layer).
Convention matches nerfstudio / the reference C++ (OpenGL-style): camera-space
ray directions are ``[(x - cx)/fx, -(y - cy)/fy, -1]`` rotated by the
camera-to-world rotation (see ``GetVisiCams``,
``gfnerf/bindings/PtsSampler/PersSampler.cpp:60-66`` and
``nerfstudio/cameras/cameras.py:650-681``).

GF-NeRF additions carried over: per-ray ``lookat_directions`` = the camera
z-axis column of c2w (``cameras.py:704,723``), used for nearest-camera block
lookup at eval time.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from gfnerf_tpu.utils.structs import dataclass, static_field

CAMERA_TYPE_PERSPECTIVE = 0
CAMERA_TYPE_FISHEYE = 1
CAMERA_TYPE_EQUIRECTANGULAR = 2


@dataclass
class Cameras:
    """A batch of cameras, SoA layout. Leading dim N = number of cameras."""

    camera_to_worlds: jnp.ndarray  # (N, 3, 4)
    fx: jnp.ndarray                # (N,)
    fy: jnp.ndarray                # (N,)
    cx: jnp.ndarray                # (N,)
    cy: jnp.ndarray                # (N,)
    width: jnp.ndarray             # (N,) int32
    height: jnp.ndarray            # (N,) int32
    distortion_params: Optional[jnp.ndarray] = None  # (N, 6) k1 k2 k3 k4 p1 p2
    camera_type: int = static_field(default=CAMERA_TYPE_PERSPECTIVE)

    def __len__(self) -> int:
        return self.camera_to_worlds.shape[0]

    @property
    def positions(self) -> jnp.ndarray:
        """(N, 3) camera centers in world space."""
        return self.camera_to_worlds[:, :, 3]

    @property
    def lookat_dirs(self) -> jnp.ndarray:
        """(N, 3) camera z-axes in world space (reference cameras.py:704)."""
        return self.camera_to_worlds[:, :, 2]

    def intrinsics_matrices(self) -> jnp.ndarray:
        """(N, 3, 3) pinhole intrinsics (reference Cameras.get_intrinsics_matrices)."""
        n = len(self)
        k = jnp.zeros((n, 3, 3), dtype=jnp.float32)
        k = k.at[:, 0, 0].set(self.fx)
        k = k.at[:, 1, 1].set(self.fy)
        k = k.at[:, 0, 2].set(self.cx)
        k = k.at[:, 1, 2].set(self.cy)
        k = k.at[:, 2, 2].set(1.0)
        return k


def camera_ray_directions(
    coords: jnp.ndarray,  # (..., 2) pixel coords as (y, x)
    fx, fy, cx, cy,
    camera_type: int = CAMERA_TYPE_PERSPECTIVE,
    width=None, height=None,
) -> jnp.ndarray:
    """Camera-space (un-normalized) direction for pixel coords (y, x).

    Perspective (cameras.py:650-660), fisheye equidistant (cameras.py:662-670)
    and equirectangular (cameras.py:672-681) models."""
    y = coords[..., 0]
    x = coords[..., 1]
    if camera_type == CAMERA_TYPE_PERSPECTIVE:
        return jnp.stack(
            [(x - cx) / fx, -(y - cy) / fy, -jnp.ones_like(x)], axis=-1)
    if camera_type == CAMERA_TYPE_FISHEYE:
        u = (x - cx) / fx
        v = -(y - cy) / fy
        theta = jnp.sqrt(u * u + v * v)          # equidistant: r = f * theta
        theta = jnp.clip(theta, 1e-9, jnp.pi)
        sin_over = jnp.sin(theta) / theta
        return jnp.stack([u * sin_over, v * sin_over, -jnp.cos(theta)],
                         axis=-1)
    if camera_type == CAMERA_TYPE_EQUIRECTANGULAR:
        # pixel -> (longitude, latitude)
        lon = (x / width - 0.5) * 2.0 * jnp.pi
        lat = -(y / height - 0.5) * jnp.pi
        return jnp.stack([jnp.sin(lon) * jnp.cos(lat), jnp.sin(lat),
                          -jnp.cos(lon) * jnp.cos(lat)], axis=-1)
    raise ValueError(camera_type)


def generate_rays(
    cameras: Cameras,
    camera_index: int | jnp.ndarray,
    coords: jnp.ndarray,  # (..., 2) pixel coords (y, x); offset by +0.5 for centers
):
    """Generate world-space rays for one camera at the given pixel coords.

    Returns a dict with origins, directions (unit), pixel_area, lookat, all
    shaped like ``coords[..., 0]``.
    """
    c2w = cameras.camera_to_worlds[camera_index]  # (3, 4)
    fx = cameras.fx[camera_index]
    fy = cameras.fy[camera_index]
    cx = cameras.cx[camera_index]
    cy = cameras.cy[camera_index]

    w_i = cameras.width[camera_index]
    h_i = cameras.height[camera_index]
    ct = cameras.camera_type
    d_cam = camera_ray_directions(coords, fx, fy, cx, cy, ct, w_i, h_i)
    # neighbours for pixel area (reference cameras.py computes dx/dy from
    # adjacent-pixel direction differences)
    d_cam_dx = camera_ray_directions(coords + jnp.array([0.0, 1.0]), fx, fy,
                                     cx, cy, ct, w_i, h_i)
    d_cam_dy = camera_ray_directions(coords + jnp.array([1.0, 0.0]), fx, fy,
                                     cx, cy, ct, w_i, h_i)

    rot = c2w[:3, :3]

    def to_world_unit(d):
        w = d @ rot.T
        return w / jnp.linalg.norm(w, axis=-1, keepdims=True)

    d_world = to_world_unit(d_cam)
    dx = jnp.linalg.norm(to_world_unit(d_cam_dx) - d_world, axis=-1)
    dy = jnp.linalg.norm(to_world_unit(d_cam_dy) - d_world, axis=-1)
    pixel_area = (dx * dy)[..., None]

    origins = jnp.broadcast_to(c2w[:3, 3], d_world.shape)
    lookat = jnp.broadcast_to(c2w[:3, 2], d_world.shape)
    return {
        "origins": origins,
        "directions": d_world,
        "pixel_area": pixel_area,
        "lookat_directions": lookat,
    }


def generate_rays_multi(
    cameras: Cameras,
    camera_indices: jnp.ndarray,  # (R,) int32
    coords: jnp.ndarray,          # (R, 2) pixel coords (y, x)
):
    """Vectorized ray generation across per-ray camera indices (pixel-sampler path).

    Applies OpenCV radial/tangential undistortion when the cameras carry
    distortion parameters (reference cameras.py:446-462)."""
    c2w = cameras.camera_to_worlds[camera_indices]     # (R, 3, 4)
    fx = cameras.fx[camera_indices]
    fy = cameras.fy[camera_indices]
    cx = cameras.cx[camera_indices]
    cy = cameras.cy[camera_indices]

    ct = cameras.camera_type
    w_r = cameras.width[camera_indices]
    h_r = cameras.height[camera_indices]
    d_cam = camera_ray_directions(coords, fx, fy, cx, cy, ct, w_r, h_r)
    if ct == CAMERA_TYPE_PERSPECTIVE and cameras.distortion_params is not None:
        from gfnerf_tpu.utils.camera_utils import (
            radial_and_tangential_undistort_jax)

        dist = cameras.distortion_params[camera_indices]
        und = radial_and_tangential_undistort_jax(
            jnp.stack([d_cam[..., 0], -d_cam[..., 1]], -1), dist)
        d_cam = jnp.stack([und[..., 0], -und[..., 1],
                           -jnp.ones_like(und[..., 0])], axis=-1)
    d_cam_dx = camera_ray_directions(coords + jnp.array([0.0, 1.0]), fx, fy,
                                     cx, cy, ct, w_r, h_r)
    d_cam_dy = camera_ray_directions(coords + jnp.array([1.0, 0.0]), fx, fy,
                                     cx, cy, ct, w_r, h_r)

    rot = c2w[:, :3, :3]  # (R, 3, 3)

    def to_world_unit(d):
        w = jnp.einsum("rij,rj->ri", rot, d)
        return w / jnp.linalg.norm(w, axis=-1, keepdims=True)

    d_world = to_world_unit(d_cam)
    dx = jnp.linalg.norm(to_world_unit(d_cam_dx) - d_world, axis=-1)
    dy = jnp.linalg.norm(to_world_unit(d_cam_dy) - d_world, axis=-1)
    pixel_area = (dx * dy)[..., None]

    return {
        "origins": c2w[:, :3, 3],
        "directions": d_world,
        "pixel_area": pixel_area,
        "lookat_directions": c2w[:, :3, 2],
    }


def get_image_coords(height: int, width: int, pixel_offset: float = 0.5) -> np.ndarray:
    """(H, W, 2) grid of (y, x) pixel-center coords (reference cameras.py:295-310)."""
    yy, xx = np.meshgrid(
        np.arange(height, dtype=np.float32) + pixel_offset,
        np.arange(width, dtype=np.float32) + pixel_offset,
        indexing="ij",
    )
    return np.stack([yy, xx], axis=-1)
