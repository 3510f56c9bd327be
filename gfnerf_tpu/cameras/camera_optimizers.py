"""Camera pose optimization.

Port of ``nerfstudio/cameras/camera_optimizers.py`` + ``lie_groups.py``:
learnable per-camera SO3xR3 or SE3 pose deltas applied to generated rays
(off in the gf-nerf config, ``gfnerf/config.py:82-86``, but part of the
framework surface).  Deltas are a (num_cameras, 6) tangent-space parameter
pytree; ``apply_to_rays`` composes exp(delta) with the rays of each camera.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class CameraOptimizerConfig:
    mode: str = "off"            # "off" | "SO3xR3" | "SE3"
    trans_l2_penalty: float = 1e-2
    rot_l2_penalty: float = 1e-3


def init_pose_adjustment(num_cameras: int) -> jnp.ndarray:
    """(num_cameras, 6) tangent vectors, zero-initialized."""
    return jnp.zeros((num_cameras, 6), jnp.float32)


def exp_map_so3(omega: jnp.ndarray) -> jnp.ndarray:
    """so(3) -> SO(3) via Rodrigues. omega (..., 3) -> (..., 3, 3).

    Gradient-safe at theta=0: the singular expressions are evaluated only at
    clamped-safe arguments (the naive where(sin(t)/t, 1) form produces NaN
    gradients at exactly zero tangents — the initialization point)."""
    theta_sq = jnp.sum(omega * omega, axis=-1, keepdims=True)[..., None]
    small = theta_sq < 1e-10
    theta_safe = jnp.sqrt(jnp.where(small, 1.0, theta_sq))
    wx, wy, wz = omega[..., 0], omega[..., 1], omega[..., 2]
    zeros = jnp.zeros_like(wx)
    K = jnp.stack([
        jnp.stack([zeros, -wz, wy], -1),
        jnp.stack([wz, zeros, -wx], -1),
        jnp.stack([-wy, wx, zeros], -1),
    ], -2)
    A = jnp.where(small, 1.0 - theta_sq / 6.0,
                  jnp.sin(theta_safe) / theta_safe)
    B = jnp.where(small, 0.5 - theta_sq / 24.0,
                  (1 - jnp.cos(theta_safe)) / jnp.where(small, 1.0, theta_sq))
    eye = jnp.eye(3)
    return eye + A * K + B * (K @ K)


def exp_map_se3(tangent: jnp.ndarray):
    """se(3) -> SE(3): tangent (..., 6) = (v, omega). Returns (R, t)."""
    v = tangent[..., :3]
    omega = tangent[..., 3:]
    R = exp_map_so3(omega)
    theta_sq = jnp.sum(omega * omega, axis=-1, keepdims=True)[..., None]
    small = theta_sq < 1e-10
    theta_safe = jnp.sqrt(jnp.where(small, 1.0, theta_sq))
    wx, wy, wz = omega[..., 0], omega[..., 1], omega[..., 2]
    zeros = jnp.zeros_like(wx)
    K = jnp.stack([
        jnp.stack([zeros, -wz, wy], -1),
        jnp.stack([wz, zeros, -wx], -1),
        jnp.stack([-wy, wx, zeros], -1),
    ], -2)
    safe_sq = jnp.where(small, 1.0, theta_sq)
    B = jnp.where(small, 0.5 - theta_sq / 24.0,
                  (1 - jnp.cos(theta_safe)) / safe_sq)
    C = jnp.where(small, 1.0 / 6.0 - theta_sq / 120.0,
                  (theta_safe - jnp.sin(theta_safe)) / (safe_sq * theta_safe))
    V = jnp.eye(3) + B * K + C * (K @ K)
    t = (V @ v[..., None])[..., 0]
    return R, t


def apply_to_rays(cfg: CameraOptimizerConfig, adjustment: jnp.ndarray,
                  camera_indices: jnp.ndarray,
                  origins: jnp.ndarray, directions: jnp.ndarray):
    """Apply per-camera pose deltas to rays (camera_optimizers.py apply path).

    SO3xR3: rotation + independent translation; SE3: full screw motion.
    """
    if cfg.mode == "off":
        return origins, directions
    tang = adjustment[camera_indices]              # (R, 6)
    if cfg.mode == "SO3xR3":
        R = exp_map_so3(tang[..., 3:])
        t = tang[..., :3]
    elif cfg.mode == "SE3":
        R, t = exp_map_se3(tang)
    else:
        raise ValueError(cfg.mode)
    new_o = (R @ origins[..., None])[..., 0] + t
    new_d = (R @ directions[..., None])[..., 0]
    return new_o, new_d


def pose_regularization(cfg: CameraOptimizerConfig,
                        adjustment: jnp.ndarray) -> jnp.ndarray:
    if cfg.mode == "off":
        return jnp.asarray(0.0)
    return (cfg.trans_l2_penalty * jnp.sum(adjustment[:, :3] ** 2)
            + cfg.rot_l2_penalty * jnp.sum(adjustment[:, 3:] ** 2))
