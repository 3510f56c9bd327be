"""Ray samplers for the stock model families.

Ports of ``nerfstudio/model_components/ray_samplers.py``: spaced samplers
(uniform / linear-in-disparity / sqrt / log, :32-200), the PDF importance
sampler (:220-330) and the mip-NeRF-360 ``ProposalNetworkSampler``
(:510-601) used by nerfacto-class models.  (The GF-NeRF path uses the
perspective octree sampler in ``gfnerf_tpu.sampler`` instead.)

All functions are jittable with static sample counts.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def spaced_sample(
    rng: jax.Array,
    nears: jnp.ndarray,       # (R, 1)
    fars: jnp.ndarray,        # (R, 1)
    num_samples: int,
    spacing: str = "uniform",  # uniform | lindisp | sqrt | log
    train_stratified: bool = True,
):
    """Returns (bin_starts, bin_ends, spacing_starts, spacing_ends), each
    (R, num_samples[, 1])-less trailing dims: (R, S)."""
    r = nears.shape[0]
    bins = jnp.linspace(0.0, 1.0, num_samples + 1)[None, :]  # (1, S+1)
    if train_stratified and rng is not None:
        jitter = jax.random.uniform(rng, (r, num_samples + 1)) - 0.5
        bin_centers = (bins[:, 1:] + bins[:, :-1]) / 2.0
        bin_upper = jnp.concatenate([bin_centers, bins[:, -1:]], axis=-1)
        bin_lower = jnp.concatenate([bins[:, :1], bin_centers], axis=-1)
        bins = bin_lower + (bin_upper - bin_lower) * (jitter + 0.5)

    if spacing == "uniform":
        sfn, sfn_inv = (lambda x: x), (lambda x: x)
    elif spacing == "lindisp":
        sfn, sfn_inv = (lambda x: 1.0 / x), (lambda x: 1.0 / x)
    elif spacing == "sqrt":
        sfn, sfn_inv = jnp.sqrt, (lambda x: x ** 2)
    elif spacing == "log":
        sfn, sfn_inv = jnp.log, jnp.exp
    else:
        raise ValueError(spacing)

    s_near, s_far = sfn(nears), sfn(fars)
    euclidean_bins = sfn_inv(bins * s_far + (1.0 - bins) * s_near)  # (R, S+1)
    return (euclidean_bins[:, :-1], euclidean_bins[:, 1:],
            bins[:, :-1] * jnp.ones((r, 1)), bins[:, 1:] * jnp.ones((r, 1)))


def pdf_sample(
    rng: Optional[jax.Array],
    spacing_starts: jnp.ndarray,   # (R, S_old)
    spacing_ends: jnp.ndarray,     # (R, S_old)
    weights: jnp.ndarray,          # (R, S_old)
    num_samples: int,
    histogram_padding: float = 0.01,
    include_original: bool = False,
):
    """Importance-sample new normalized bins from a weight histogram
    (PDFSampler, ray_samplers.py:220-330). Returns (spacing_starts,
    spacing_ends) of shape (R, num_samples)."""
    r, s_old = weights.shape
    num_bins = num_samples + 1
    weights = weights + histogram_padding
    weights_sum = jnp.sum(weights, axis=-1, keepdims=True)
    padding = jnp.maximum(0.0, 1e-5 - weights_sum)
    weights = weights + padding / weights.shape[-1]
    weights_sum = weights_sum + padding

    pdf = weights / weights_sum
    cdf = jnp.minimum(1.0, jnp.cumsum(pdf[:, :-1], axis=-1))
    cdf = jnp.concatenate(
        [jnp.zeros((r, 1)), cdf, jnp.ones((r, 1))], axis=-1)  # (R, S_old+1)

    if rng is not None:
        u = jnp.linspace(0.0, 1.0 - 1.0 / num_bins, num_bins)[None, :]
        u = u + jax.random.uniform(rng, (r, num_bins)) / num_bins
    else:
        u = jnp.linspace(0.0, 1.0 - 1.0 / num_bins, num_bins)[None, :]
        u = u + 0.5 / num_bins
        u = jnp.broadcast_to(u, (r, num_bins))

    existing_bins = jnp.concatenate(
        [spacing_starts[:, :1], spacing_ends], axis=-1)  # (R, S_old+1)

    # vectorized searchsorted per-row (S_old is small)
    inds = jnp.sum(u[:, :, None] >= cdf[:, None, :], axis=-1)  # (R, num_bins)
    below = jnp.clip(inds - 1, 0, cdf.shape[-1] - 1)
    above = jnp.clip(inds, 0, cdf.shape[-1] - 1)
    cdf_g0 = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_g1 = jnp.take_along_axis(cdf, above, axis=-1)
    bins_g0 = jnp.take_along_axis(existing_bins, below, axis=-1)
    bins_g1 = jnp.take_along_axis(existing_bins, above, axis=-1)
    t = jnp.clip(jnp.nan_to_num((u - cdf_g0) / (cdf_g1 - cdf_g0), nan=0.0),
                 0.0, 1.0)
    bins = bins_g0 + t * (bins_g1 - bins_g0)

    if include_original:
        bins = jnp.sort(jnp.concatenate([bins, existing_bins], axis=-1),
                        axis=-1)
    bins = jax.lax.stop_gradient(bins)
    return bins[:, :-1], bins[:, 1:]


def proposal_sample(
    rng: jax.Array,
    nears: jnp.ndarray,            # (R, 1)
    fars: jnp.ndarray,             # (R, 1)
    density_fns,                   # list of fn(positions (R,S,3)) -> (R,S)
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    num_proposal_samples: tuple = (256,),
    num_nerf_samples: int = 48,
    initial_spacing: str = "uniform",
    anneal: float = 1.0,
    train_stratified: bool = True,
):
    """ProposalNetworkSampler (ray_samplers.py:510-601): hierarchical
    importance sampling through small density fields.

    Returns dict with final (bin_starts, bin_ends, spacing_starts,
    spacing_ends) and per-level (weights, spacing bins) lists for the
    interlevel loss.
    """
    keys = jax.random.split(rng, len(num_proposal_samples) + 1)
    weights_list = []
    spacing_list = []

    def spacing_to_t(s):
        # uniform spacing in [0, 1] -> euclidean via near/far
        return s * fars + (1.0 - s) * nears

    s_starts = s_ends = None
    weights = None
    for level, n in enumerate(num_proposal_samples):
        if level == 0:
            bs, be, s_starts, s_ends = spaced_sample(
                keys[level] if train_stratified else None, nears, fars, n,
                spacing=initial_spacing, train_stratified=train_stratified)
        else:
            annealed = jnp.power(weights, anneal)
            s_starts, s_ends = pdf_sample(
                keys[level] if train_stratified else None,
                s_starts, s_ends, annealed, n)
            bs = spacing_to_t(s_starts)
            be = spacing_to_t(s_ends)
        mid = (bs + be) / 2.0
        pos = rays_o[:, None, :] + mid[..., None] * rays_d[:, None, :]
        density = density_fns[level](pos)
        from gfnerf_tpu.cameras.rays import get_weights_f2nerf

        weights, _, _ = get_weights_f2nerf(be - bs, density)
        weights_list.append(weights)
        spacing_list.append((s_starts, s_ends))

    annealed = jnp.power(weights, anneal)
    s_starts, s_ends = pdf_sample(
        keys[-1] if train_stratified else None, s_starts, s_ends, annealed,
        num_nerf_samples)
    bs = spacing_to_t(s_starts)
    be = spacing_to_t(s_ends)
    return {
        "bin_starts": bs, "bin_ends": be,
        "spacing_starts": s_starts, "spacing_ends": s_ends,
        "weights_list": weights_list, "spacing_list": spacing_list,
    }
