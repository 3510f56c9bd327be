"""Spatial distortions.

Port of ``nerfstudio/field_components/spatial_distortions.py``:
``SceneContraction`` (mip-NeRF-360 contraction; the GF-NeRF model constructs
it with order=inf, ``gfnerf/nerfacto.py:216``).
"""

from __future__ import annotations

import jax.numpy as jnp


def scene_contraction(positions: jnp.ndarray, order=jnp.inf) -> jnp.ndarray:
    """Contract R^3 into a ball of radius 2: x for |x|<=1 else
    (2 - 1/|x|) * x/|x|."""
    if order == jnp.inf or order == "inf":
        mag = jnp.max(jnp.abs(positions), axis=-1, keepdims=True)
    else:
        mag = jnp.linalg.norm(positions, ord=order, axis=-1, keepdims=True)
    mag = jnp.maximum(mag, 1e-10)
    contracted = (2.0 - 1.0 / mag) * (positions / mag)
    return jnp.where(mag <= 1.0, positions, contracted)
