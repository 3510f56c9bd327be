"""Instant-NGP-class model: hash field + occupancy-grid sampling.

TPU-native equivalent of ``nerfstudio/models/instant_ngp.py`` + the nerfacc
occupancy-grid ``VolumetricSampler`` (``nerfstudio/model_components/
ray_samplers.py:373-430``):

- a dense occupancy grid over the scene AABB, EMA-updated every step from
  density queries at jittered cell centers (nerfacc's update rule),
- sampling: stratified uniform samples along each ray inside the AABB,
  masked by an occupancy-grid gather — the TPU replacement for nerfacc's
  CUDA ray marching (fixed shapes + masks instead of variable-length
  packed samples).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gfnerf_tpu.cameras.rays import get_weights_f2nerf
from gfnerf_tpu.fields.activations import trunc_exp
from gfnerf_tpu.fields.hash_encoding import hash_encode_sorted, init_hash_params
from gfnerf_tpu.fields.mlp import apply_mlp, init_mlp
from gfnerf_tpu.fields.sh_encoding import sh_encode_deg4
from gfnerf_tpu.model_components.losses import mse_loss
from gfnerf_tpu.model_components.renderers import (
    render_accumulation,
    render_expected_depth,
    render_rgb,
)
from gfnerf_tpu.model_components.scene_colliders import aabb_collider


@dataclasses.dataclass
class InstantNGPConfig:
    aabb_scale: float = 1.5
    grid_resolution: int = 96
    num_samples: int = 192
    num_levels: int = 16
    log2_hashmap_size: int = 19
    hidden_dim: int = 64
    geo_feat_dim: int = 15
    occ_ema_decay: float = 0.95
    occ_threshold: float = 0.01
    background_color: str = "white"
    num_images: int = 1


def init_instant_ngp_params(cfg: InstantNGPConfig, seed: int = 0):
    rng = np.random.default_rng(seed)
    table = init_hash_params(
        seed=int(rng.integers(1 << 31)), log2_table_size=cfg.log2_hashmap_size,
        n_volumes=1, n_levels=cfg.num_levels, init_mode="reset")
    params = {
        "feat": table.feat_pool,
        "base_net": init_mlp(rng, cfg.num_levels * 2, 1 + cfg.geo_feat_dim,
                             cfg.hidden_dim, 1),
        "head": init_mlp(rng, 16 + cfg.geo_feat_dim, 3, cfg.hidden_dim, 2),
    }
    statics = {"prim": table.prim_pool, "bias": table.bias_pool}
    g = cfg.grid_resolution
    model_state = {"occ": jnp.ones((g, g, g), jnp.float32)}
    return params, statics, model_state


def _aabb(cfg):
    return jnp.array([[-cfg.aabb_scale] * 3, [cfg.aabb_scale] * 3])


def _density(params, statics, cfg, pos):
    """pos (..., 3) world -> density, geo."""
    aabb = _aabb(cfg)
    p = ((pos - aabb[0]) / (aabb[1] - aabb[0])).reshape(-1, 3)
    anc = jnp.zeros(p.shape[0], jnp.int32)
    feats = hash_encode_sorted(params["feat"], statics["prim"],
                               statics["bias"], p, anc)
    h = apply_mlp(params["base_net"], feats)
    density = trunc_exp(h[..., 0]).reshape(pos.shape[:-1])
    return density, h[..., 1:]


def occupancy_lookup(model_state, cfg, pos):
    """Occupancy value at world positions (nearest cell)."""
    aabb = _aabb(cfg)
    g = cfg.grid_resolution
    cell = jnp.clip(((pos - aabb[0]) / (aabb[1] - aabb[0]) * g), 0, g - 1)
    cell = cell.astype(jnp.int32)
    return model_state["occ"][cell[..., 0], cell[..., 1], cell[..., 2]]


def update_occupancy(params, statics, model_state, cfg, rng):
    """EMA occupancy update at jittered cell centers (nerfacc update_every_n_steps)."""
    g = cfg.grid_resolution
    aabb = _aabb(cfg)
    ii = jnp.arange(g)
    grid = jnp.stack(jnp.meshgrid(ii, ii, ii, indexing="ij"), -1)  # (g,g,g,3)
    jitter = jax.random.uniform(rng, grid.shape)
    pos = aabb[0] + (grid + jitter) / g * (aabb[1] - aabb[0])
    density, _ = _density(params, statics, cfg, pos.reshape(-1, 3))
    density = jax.lax.stop_gradient(density).reshape(g, g, g)
    occ = jnp.maximum(model_state["occ"] * cfg.occ_ema_decay, density)
    return {"occ": occ}


def instant_ngp_forward(params, statics, model_state, cfg: InstantNGPConfig,
                        rng, rays_o, rays_d, train: bool = True):
    r = rays_o.shape[0]
    aabb = _aabb(cfg)
    nears, fars = aabb_collider(rays_o, rays_d, aabb, near_plane=0.02)
    s = cfg.num_samples
    u = jnp.linspace(0.0, 1.0, s + 1)[None, :]
    if train and rng is not None:
        u = u + jax.random.uniform(rng, (r, s + 1)) / (s + 1)
    ts = nears + u * (fars - nears)
    bs, be = ts[:, :-1], ts[:, 1:]
    mid = (bs + be) / 2.0
    pos = rays_o[:, None, :] + mid[..., None] * rays_d[:, None, :]

    # occupancy cull (the nerfacc grid-skip equivalent)
    occ = occupancy_lookup(model_state, cfg, pos)
    keep = occ > cfg.occ_threshold

    density, geo = _density(params, statics, cfg, pos)
    density = density * keep
    d_enc = sh_encode_deg4(
        jnp.broadcast_to(rays_d[:, None, :], pos.shape).reshape(-1, 3))
    rgb_s = apply_mlp(params["head"],
                      jnp.concatenate([d_enc, geo], -1),
                      output_activation="sigmoid").reshape(r, s, 3)
    w, alphas, _ = get_weights_f2nerf(be - bs, density)
    return {
        "rgb": render_rgb(w, rgb_s, cfg.background_color),
        "accumulation": render_accumulation(w),
        "depth": render_expected_depth(w, mid),
        "weights": w,
        "keep_frac": jnp.mean(keep.astype(jnp.float32)),
    }


def instant_ngp_loss(params, statics, model_state, cfg, rng, rays_o, rays_d,
                     target, train=True):
    out = instant_ngp_forward(params, statics, model_state, cfg, rng,
                              rays_o, rays_d, train)
    losses = {"rgb_loss": mse_loss(out["rgb"], target)}
    return sum(losses.values()), (losses, out)
