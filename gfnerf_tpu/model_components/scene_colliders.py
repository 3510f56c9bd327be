"""Scene colliders: set per-ray near/far bounds.

Port of ``nerfstudio/model_components/scene_colliders.py``:
NearFarCollider, AABBBoxCollider, SphereCollider.
"""

from __future__ import annotations

import jax.numpy as jnp


def near_far_collider(rays_o, rays_d, near_plane: float, far_plane: float):
    r = rays_o.shape[0]
    nears = jnp.full((r, 1), near_plane)
    fars = jnp.full((r, 1), far_plane)
    return nears, fars


def aabb_collider(rays_o, rays_d, aabb, near_plane: float = 0.0):
    """aabb: (2, 3) [min; max]. Returns (nears, fars) clipped to the box."""
    inv = 1.0 / jnp.where(jnp.abs(rays_d) < 1e-10, 1e-10, rays_d)
    t0 = (aabb[0][None] - rays_o) * inv
    t1 = (aabb[1][None] - rays_o) * inv
    near = jnp.max(jnp.minimum(t0, t1), axis=-1, keepdims=True)
    far = jnp.min(jnp.maximum(t0, t1), axis=-1, keepdims=True)
    near = jnp.maximum(near, near_plane)
    far = jnp.maximum(far, near + 1e-6)
    return near, far


def sphere_collider(rays_o, rays_d, center, radius: float,
                    near_plane: float = 0.0):
    oc = rays_o - center[None]
    b = jnp.sum(oc * rays_d, axis=-1, keepdims=True)
    c = jnp.sum(oc * oc, axis=-1, keepdims=True) - radius ** 2
    disc = jnp.maximum(b * b - c, 0.0)
    sq = jnp.sqrt(disc)
    near = jnp.maximum(-b - sq, near_plane)
    far = jnp.maximum(-b + sq, near + 1e-6)
    return near, far
