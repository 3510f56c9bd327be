"""Math utilities.

Equivalent of ``nerfstudio/utils/math.py``: AABB intersection (the basis of
the collider + octree visibility tests), safe normalization, sphere
intersection.
"""

from __future__ import annotations

import jax.numpy as jnp


def intersect_aabb(origins, directions, aabb, max_bound: float = 1e10,
                   invalid_value: float = 1e10):
    """Ray/AABB slab intersection (math.py intersect_aabb).

    origins/directions (..., 3); aabb (2, 3). Returns (t_min, t_max) with
    invalid rays set to invalid_value.
    """
    inv = 1.0 / jnp.where(jnp.abs(directions) < 1e-10, 1e-10, directions)
    t0 = (aabb[0] - origins) * inv
    t1 = (aabb[1] - origins) * inv
    t_min = jnp.max(jnp.minimum(t0, t1), axis=-1)
    t_max = jnp.min(jnp.maximum(t0, t1), axis=-1)
    t_min = jnp.clip(t_min, 0.0, max_bound)
    t_max = jnp.clip(t_max, 0.0, max_bound)
    hit = t_max > t_min
    return (jnp.where(hit, t_min, invalid_value),
            jnp.where(hit, t_max, invalid_value))


def intersect_sphere(origins, directions, center, radius):
    oc = origins - center
    b = jnp.sum(oc * directions, axis=-1)
    c = jnp.sum(oc * oc, axis=-1) - radius ** 2
    disc = b * b - c
    hit = disc >= 0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    return jnp.where(hit, -b - sq, 1e10), jnp.where(hit, -b + sq, 1e10)


def safe_normalize(x, eps: float = 1e-10):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)
