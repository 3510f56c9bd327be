"""Coordinate encodings for the stock model families.

Ports of ``nerfstudio/field_components/encodings.py``: NeRF frequency
encoding (:79-130), random Fourier features (:133-170).  The hash encoding
lives in ``hash_encoding.py`` (anchored variant; plain usage = n_volumes=1,
anchors=0).  SH encoding in ``sh_encoding.py``.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def nerf_frequency_encode(
    x: jnp.ndarray,                 # (..., D) in [0, 1] or [-1, 1]
    num_frequencies: int = 10,
    min_freq_exp: float = 0.0,
    max_freq_exp: float = 8.0,
    include_input: bool = False,
) -> jnp.ndarray:
    """NeRF sin/cos encoding: (..., D * num_frequencies * 2 [+ D])."""
    freqs = 2.0 ** jnp.linspace(min_freq_exp, max_freq_exp, num_frequencies)
    scaled = 2.0 * jnp.pi * x[..., None] * freqs  # (..., D, F)
    enc = jnp.sin(
        jnp.concatenate([scaled, scaled + jnp.pi / 2.0], axis=-1)
    )  # (..., D, 2F)
    enc = enc.reshape(*x.shape[:-1], -1)
    if include_input:
        enc = jnp.concatenate([x, enc], axis=-1)
    return enc


def rff_encode(x: jnp.ndarray, b_matrix: jnp.ndarray) -> jnp.ndarray:
    """Random Fourier features: b_matrix (D, F) fixed gaussian."""
    scaled = 2.0 * jnp.pi * x @ b_matrix
    return jnp.concatenate([jnp.sin(scaled), jnp.cos(scaled)], axis=-1)


def init_rff_matrix(rng: np.random.Generator, in_dim: int, num_freqs: int,
                    scale: float = 10.0) -> jnp.ndarray:
    return jnp.asarray(
        rng.standard_normal((in_dim, num_freqs)).astype(np.float32) * scale)
