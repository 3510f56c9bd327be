"""Ray and sample pytrees.

TPU-native equivalents of the reference's ray containers
(``nerfstudio/cameras/rays.py``): ``RayBundle`` (with GF-NeRF's extra
``lookat_directions`` / ``rel_camera_indices`` / ``steps`` fields,
rays.py:234-250) and ``RaySamples`` + ``WarpedSamples`` (rays.py:108-153).

Everything is a fixed-shape SoA pytree: rays are ``(R, ...)``, samples are
``(R, S, ...)`` with a validity mask — mirroring the reference's own
``MAX_SAMPLE_PER_RAY`` zero-padding discipline
(``gfnerf/bindings/PtsSampler/PersSampler_cuda.cu:9,437-444``), which maps
directly onto XLA static shapes.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from gfnerf_tpu.utils.structs import dataclass


@dataclass
class RayBundle:
    """A batch of rays.  All leaves have leading shape ``(R,)``."""

    origins: jnp.ndarray          # (R, 3) world-space ray origins
    directions: jnp.ndarray       # (R, 3) unit direction vectors
    lookat_directions: jnp.ndarray  # (R, 3) camera optical-axis dirs (rays.py:234)
    pixel_area: jnp.ndarray       # (R, 1) pixel footprint at unit distance
    camera_indices: jnp.ndarray   # (R, 1) int32 absolute camera index
    rel_camera_indices: jnp.ndarray  # (R, 1) int32 appearance-embedding index (rays.py:240)
    nears: Optional[jnp.ndarray] = None   # (R, 1)
    fars: Optional[jnp.ndarray] = None    # (R, 1)

    def __len__(self) -> int:
        return self.origins.shape[0]


@dataclass
class WarpedSamples:
    """Perspective-warped sample data emitted by the octree marcher.

    Equivalent of the reference ``WarpedSamples`` (rays.py:108-118); the
    reference's (n_rays, 1024, .) zero-padded tensors become (R, S, .) arrays
    plus an explicit validity mask (valid == anchor >= 0, the same convention
    the reference field uses at ``gfnerf/nerfacto_field.py:444``).
    """

    world_pts: jnp.ndarray     # (R, S, 3) sample positions, world space
    warp_pts: jnp.ndarray      # (R, S, 3) positions in per-node warped space
    dists: jnp.ndarray         # (R, S) world-space delta along ray
    ts: jnp.ndarray            # (R, S) distance along ray
    trans_idx: jnp.ndarray     # (R, S) int32 warp/volume anchor (-1 invalid)
    oct_idx: jnp.ndarray       # (R, S) int32 octree node index (-1 invalid)
    block_idx: jnp.ndarray     # (R, S) int32 focal block index (-1 unassigned)
    valid: jnp.ndarray         # (R, S) bool
    num_valid: jnp.ndarray     # (R,) int32 count of valid samples per ray
    first_oct_dis: jnp.ndarray  # (R,) t of first octree hit (1e9 if none)
    num_hits: Optional[jnp.ndarray] = None
    """(R,) int32 count of leaf intersections per ray (fast march only) —
    BEFORE the max_hits top-k, so num_hits > max_hits flags rays whose
    farthest leaves were truncated (the reference's bound is 1024
    intersections/ray, PersSampler_cuda.cu:7-9)."""


@dataclass
class RaySamples:
    """Samples along rays: frustum data + warped samples + per-ray metadata."""

    origins: jnp.ndarray          # (R, 3)
    directions: jnp.ndarray       # (R, 3)
    f2samples: WarpedSamples
    camera_indices: jnp.ndarray   # (R,) int32
    rel_camera_indices: jnp.ndarray  # (R,) int32
    deltas: jnp.ndarray           # (R, S) = f2samples.dists
    pixel_area: jnp.ndarray       # (R, 1)

    @property
    def shape(self):
        return self.deltas.shape


def get_weights_f2nerf(deltas: jnp.ndarray, densities: jnp.ndarray):
    """Alpha compositing weights, alphas and transmittance.

    Port of ``RaySamples.get_weights_f2nerf`` (rays.py:178-200): weights from
    densities with an *exclusive* cumulative optical depth, returning
    (weights, alphas, transmittance).

    Args:
      deltas: (R, S) world-space step sizes.
      densities: (R, S) post-activation densities.
    Returns:
      weights, alphas, transmittance, each (R, S).
    """
    delta_density = deltas * densities
    alphas = 1.0 - jnp.exp(-delta_density)
    # exclusive cumsum along samples axis
    accum = jnp.cumsum(delta_density, axis=-1)
    accum = jnp.concatenate([jnp.zeros_like(accum[..., :1]), accum[..., :-1]], axis=-1)
    transmittance = jnp.exp(-accum)
    weights = alphas * transmittance
    weights = jnp.nan_to_num(weights)
    return weights, alphas, transmittance
