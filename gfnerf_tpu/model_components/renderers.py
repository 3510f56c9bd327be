"""Volume-rendering heads.

Equivalents of ``nerfstudio/model_components/renderers.py`` used by the
GF-NeRF model (``gfnerf/nerfacto.py:280-285``): RGB (background color
composite), accumulation, expected depth, normals, semantics.
All operate on (R, S[, C]) arrays of weights/sample values.
"""

from __future__ import annotations

import jax.numpy as jnp


def render_rgb(
    weights: jnp.ndarray,      # (R, S)
    rgbs: jnp.ndarray,         # (R, S, 3)
    background_color: str = "black",
) -> jnp.ndarray:
    comp = jnp.sum(weights[..., None] * rgbs, axis=-2)
    acc = jnp.sum(weights, axis=-1, keepdims=True)
    if background_color == "white":
        comp = comp + (1.0 - acc)
    elif background_color == "black":
        pass
    elif background_color == "last_sample":
        comp = comp + (1.0 - acc) * rgbs[..., -1, :]
    else:
        raise ValueError(background_color)
    return comp


def render_accumulation(weights: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(weights, axis=-1, keepdims=True)


def render_expected_depth(weights: jnp.ndarray, ts: jnp.ndarray) -> jnp.ndarray:
    """DepthRenderer(method="expected"): E[t] under the weights."""
    acc = jnp.sum(weights, axis=-1, keepdims=True)
    depth = jnp.sum(weights * ts, axis=-1, keepdims=True) / (acc + 1e-10)
    return jnp.nan_to_num(depth)


def render_weighted(weights: jnp.ndarray, values: jnp.ndarray) -> jnp.ndarray:
    """Generic weighted sum (normals, semantics, ...). values (R, S, C)."""
    return jnp.sum(weights[..., None] * values, axis=-2)
