"""NeuS surface model.

TPU-native equivalent of the reference's surface-model family
(``nerfstudio/models/neus.py`` + ``fields/sdf_field.py``): a
frequency-encoded SDF MLP with a learned variance parameter; opacity from
the NeuS alpha formulation (section probability of the logistic CDF along
the ray), an eikonal regularizer on analytic SDF gradients (jax.grad through
the field — no finite differences), and SDF-gradient normals fed to the
color head.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gfnerf_tpu.fields.encodings import nerf_frequency_encode
from gfnerf_tpu.fields.mlp import apply_mlp, init_mlp
from gfnerf_tpu.model_components.losses import mse_loss
from gfnerf_tpu.model_components.ray_samplers import spaced_sample
from gfnerf_tpu.model_components.renderers import (
    render_accumulation,
    render_expected_depth,
    render_rgb,
    render_weighted,
)
from gfnerf_tpu.model_components.scene_colliders import sphere_collider


@dataclasses.dataclass
class NeuSConfig:
    scene_radius: float = 3.0
    num_samples: int = 96
    pos_frequencies: int = 6
    dir_frequencies: int = 4
    hidden_dim: int = 256
    geo_feat_dim: int = 64
    eikonal_mult: float = 0.1
    background_color: str = "white"
    num_images: int = 1


def init_neus_params(cfg: NeuSConfig, seed: int = 0):
    rng = np.random.default_rng(seed)
    pos_dim = 3 * cfg.pos_frequencies * 2 + 3
    dir_dim = 3 * cfg.dir_frequencies * 2 + 3
    return {
        "sdf_mlp": init_mlp(rng, pos_dim, 1 + cfg.geo_feat_dim,
                            cfg.hidden_dim, 3),
        "color_mlp": init_mlp(rng, cfg.geo_feat_dim + dir_dim + 3 + 3, 3,
                              cfg.hidden_dim // 2, 2),
        # variance parameter: s = exp(10 * inv_s) (sdf_field.py single param)
        "inv_s": jnp.asarray(0.05, jnp.float32),
    }


def sdf_fn(params, cfg, pos):
    """SDF + geometry features at (..., 3). Initialized roughly as a sphere
    by adding an analytic sphere SDF prior."""
    pe = nerf_frequency_encode(pos, cfg.pos_frequencies, 0.0,
                               cfg.pos_frequencies - 1, include_input=True)
    h = apply_mlp(params["sdf_mlp"], pe)
    sphere = jnp.linalg.norm(pos, axis=-1) - 1.0
    sdf = h[..., 0] * 0.1 + sphere
    return sdf, h[..., 1:]


def neus_alpha(sdf, next_sdf, dists, s):
    """NeuS section alpha: clamp((cdf_prev - cdf_next) / cdf_prev).

    Uses the estimated mid-point formulation of the paper (eq. 13)."""
    mid_sdf = (sdf + next_sdf) * 0.5
    cos_val = (next_sdf - sdf) / jnp.maximum(dists, 1e-6)
    cos_val = jnp.clip(cos_val, -1e3, 0.0)   # surfaces face the camera
    est_prev = mid_sdf - cos_val * dists * 0.5
    est_next = mid_sdf + cos_val * dists * 0.5
    cdf_prev = jax.nn.sigmoid(est_prev * s)
    cdf_next = jax.nn.sigmoid(est_next * s)
    alpha = jnp.clip((cdf_prev - cdf_next + 1e-6) / (cdf_prev + 1e-6),
                     0.0, 1.0)
    return alpha


def neus_forward(params, cfg: NeuSConfig, rng, rays_o, rays_d, train=True):
    r = rays_o.shape[0]
    nears, fars = sphere_collider(rays_o, rays_d, jnp.zeros(3),
                                  cfg.scene_radius, near_plane=0.05)
    bs, be, _, _ = spaced_sample(rng if train else None, nears, fars,
                                 cfg.num_samples, train_stratified=train)
    mid = (bs + be) / 2.0
    pos = rays_o[:, None, :] + mid[..., None] * rays_d[:, None, :]
    flat = pos.reshape(-1, 3)

    sdf_flat, feat_flat = sdf_fn(params, cfg, flat)
    # analytic SDF gradients (normals + eikonal) via jvp-of-grad
    grad_flat = jax.vmap(jax.grad(
        lambda p: sdf_fn(params, cfg, p[None])[0][0]))(flat)
    normals = grad_flat / (jnp.linalg.norm(grad_flat, axis=-1,
                                           keepdims=True) + 1e-6)

    sdf = sdf_flat.reshape(r, -1)
    s = jnp.exp(10.0 * params["inv_s"])
    next_sdf = jnp.concatenate([sdf[:, 1:], sdf[:, -1:]], axis=1)
    alphas = neus_alpha(sdf, next_sdf, be - bs, s)
    trans = jnp.cumprod(
        jnp.concatenate([jnp.ones((r, 1)), 1.0 - alphas + 1e-7], axis=1),
        axis=1)[:, :-1]
    weights = alphas * trans

    de = nerf_frequency_encode(
        jnp.broadcast_to(rays_d[:, None, :], pos.shape).reshape(-1, 3),
        cfg.dir_frequencies, 0.0, cfg.dir_frequencies - 1, include_input=True)
    color_in = jnp.concatenate([feat_flat, de, flat, normals], axis=-1)
    rgb_s = apply_mlp(params["color_mlp"], color_in,
                      output_activation="sigmoid").reshape(r, -1, 3)

    return {
        "rgb": render_rgb(weights, rgb_s, cfg.background_color),
        "accumulation": render_accumulation(weights),
        "depth": render_expected_depth(weights, mid),
        "normals": render_weighted(weights, normals.reshape(r, -1, 3)),
        "weights": weights,
        "eikonal": jnp.mean(
            (jnp.linalg.norm(grad_flat, axis=-1) - 1.0) ** 2),
        "s": s,
    }


def neus_loss(params, cfg, rng, rays_o, rays_d, target, train=True):
    out = neus_forward(params, cfg, rng, rays_o, rays_d, train)
    losses = {
        "rgb_loss": mse_loss(out["rgb"], target),
        "eikonal_loss": cfg.eikonal_mult * out["eikonal"],
    }
    return sum(losses.values()), (losses, out)
