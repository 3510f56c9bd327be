"""NeRFPlayer model family (temporal radiance fields).

TPU-native equivalents of the reference's two NeRFPlayer variants:

- ``nerfplayer-nerfacto`` (``nerfstudio/models/nerfplayer_nerfacto.py:59-258``):
  the nerfacto proposal pipeline with every hash encoding replaced by the
  time-conditioned :mod:`gfnerf_tpu.fields.temporal_grid` and a temporal-TV
  regularizer over adjacent feature channels,
- ``nerfplayer-ngp`` (``nerfstudio/models/nerfplayer_ngp.py:48-220``): the
  instant-NGP occupancy-grid pipeline with a temporal field; the occupancy
  grid is updated at randomized times so empty space is only skipped where
  it stays empty across the sequence.

Per-ray times come from the dataparser's ``metadata["times"]`` (D-NeRF /
DyCheck parsers) through a per-camera lookup in the model statics; cameras
without times default to t=0 (static scene).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gfnerf_tpu.cameras.rays import get_weights_f2nerf
from gfnerf_tpu.fields.activations import trunc_exp
from gfnerf_tpu.fields.mlp import apply_mlp, init_mlp
from gfnerf_tpu.fields.sh_encoding import sh_encode_deg4
from gfnerf_tpu.fields.temporal_grid import (
    make_temporal_grid,
    temporal_grid_encode,
    temporal_tv_loss,
)
from gfnerf_tpu.model_components.losses import (
    distortion_loss,
    interlevel_loss,
    mse_loss,
)
from gfnerf_tpu.model_components.ray_samplers import proposal_sample
from gfnerf_tpu.model_components.renderers import (
    render_accumulation,
    render_expected_depth,
    render_rgb,
)
from gfnerf_tpu.model_components.scene_colliders import near_far_collider
from gfnerf_tpu.model_components.spatial_distortions import scene_contraction


@dataclasses.dataclass
class NerfplayerConfig:
    near_plane: float = 0.05
    far_plane: float = 1000.0
    temporal_dim: int = 64
    num_levels: int = 16
    base_resolution: int = 16
    desired_resolution: int = 2048
    level_dim: int = 2
    log2_hashmap_size: int = 19
    hidden_dim: int = 64
    hidden_dim_color: int = 64
    geo_feat_dim: int = 15
    appearance_embedding_dim: int = 32
    # proposal nets (nerfplayer_nerfacto.py:79-80)
    num_proposal_samples: Tuple[int, ...] = (256, 96)
    num_nerf_samples: int = 48
    prop_temporal_dim: int = 32
    prop_num_levels: int = 5
    prop_log2_hashmap_size: int = 17
    prop_max_res: Tuple[int, ...] = (64, 256)
    interlevel_loss_mult: float = 1.0
    distortion_loss_mult: float = 0.002
    temporal_tv_weight: float = 1.0   # nerfplayer_nerfacto.py:86
    background_color: str = "last_sample"
    use_scene_contraction: bool = True
    num_images: int = 1


def init_nerfplayer_params(cfg: NerfplayerConfig, seed: int = 0,
                           camera_times: np.ndarray | None = None):
    rng = np.random.default_rng(seed)
    field_emb, field_st = make_temporal_grid(
        seed=int(rng.integers(1 << 31)), temporal_dim=cfg.temporal_dim,
        num_levels=cfg.num_levels, level_dim=cfg.level_dim,
        base_resolution=cfg.base_resolution,
        log2_hashmap_size=cfg.log2_hashmap_size,
        desired_resolution=cfg.desired_resolution)
    prop_embs, prop_sts, prop_mlps = [], [], []
    for i in range(len(cfg.num_proposal_samples)):
        emb, st = make_temporal_grid(
            seed=int(rng.integers(1 << 31)),
            temporal_dim=cfg.prop_temporal_dim,
            num_levels=cfg.prop_num_levels, level_dim=cfg.level_dim,
            base_resolution=cfg.base_resolution,
            log2_hashmap_size=cfg.prop_log2_hashmap_size,
            desired_resolution=cfg.prop_max_res[
                min(i, len(cfg.prop_max_res) - 1)])
        prop_embs.append(emb)
        prop_sts.append(st)
        prop_mlps.append(init_mlp(
            rng, cfg.prop_num_levels * cfg.level_dim, 1, 16, 1))
    base_net = init_mlp(rng, cfg.num_levels * cfg.level_dim,
                        1 + cfg.geo_feat_dim, cfg.hidden_dim, 1)
    head = init_mlp(rng, 16 + cfg.geo_feat_dim + cfg.appearance_embedding_dim,
                    3, cfg.hidden_dim_color, 2)
    appearance = rng.standard_normal(
        (cfg.num_images, cfg.appearance_embedding_dim)).astype(np.float32)
    if camera_times is None:
        camera_times = np.zeros((cfg.num_images,), np.float32)
    params = {
        "field_emb": field_emb,
        "prop_embs": prop_embs,
        "prop_mlps": prop_mlps,
        "base_net": base_net,
        "mlp_head": head,
        "appearance": jnp.asarray(appearance),
    }
    statics = {
        "field_st": field_st,
        "prop_sts": prop_sts,
        "camera_times": jnp.asarray(camera_times, jnp.float32),
    }
    return params, statics


def _normalize_positions(pos, cfg):
    if cfg.use_scene_contraction:
        pos = scene_contraction(pos)
    return (pos + 2.0) / 4.0


def nerfplayer_forward(params, statics, cfg: NerfplayerConfig, rng,
                       rays_o, rays_d, rel_camera_indices, train=True):
    r = rays_o.shape[0]
    times = statics["camera_times"][rel_camera_indices]  # (R,)
    nears, fars = near_far_collider(rays_o, rays_d, cfg.near_plane,
                                    cfg.far_plane)

    def make_density_fn(level):
        def fn(pos):
            p = _normalize_positions(pos, cfg).reshape(-1, 3)
            t = jnp.broadcast_to(times[:, None], pos.shape[:-1]).reshape(-1)
            feats = temporal_grid_encode(
                params["prop_embs"][level], statics["prop_sts"][level], p, t)
            h = apply_mlp(params["prop_mlps"][level], feats)
            return trunc_exp(h[..., 0]).reshape(pos.shape[:-1])
        return fn

    out = proposal_sample(
        rng, nears, fars,
        [make_density_fn(i) for i in range(len(cfg.num_proposal_samples))],
        rays_o, rays_d,
        num_proposal_samples=cfg.num_proposal_samples,
        num_nerf_samples=cfg.num_nerf_samples,
        train_stratified=train,
    )
    bs, be = out["bin_starts"], out["bin_ends"]
    mid = (bs + be) / 2.0
    pos = rays_o[:, None, :] + mid[..., None] * rays_d[:, None, :]
    p = _normalize_positions(pos, cfg).reshape(-1, 3)
    t = jnp.broadcast_to(times[:, None], mid.shape).reshape(-1)
    feats = temporal_grid_encode(params["field_emb"], statics["field_st"],
                                 p, t)
    h = apply_mlp(params["base_net"], feats)
    density = trunc_exp(h[..., 0]).reshape(r, -1)
    geo = h[..., 1:]
    d_enc = sh_encode_deg4(
        jnp.broadcast_to(rays_d[:, None, :], pos.shape).reshape(-1, 3))
    emb = params["appearance"][
        jnp.broadcast_to(rel_camera_indices[:, None], mid.shape).reshape(-1)]
    rgb_s = apply_mlp(params["mlp_head"],
                      jnp.concatenate([d_enc, geo, emb], -1),
                      output_activation="sigmoid").reshape(r, -1, 3)

    weights, alphas, _ = get_weights_f2nerf(be - bs, density)
    rgb = render_rgb(weights, rgb_s, cfg.background_color)
    return {
        "rgb": rgb,
        "accumulation": render_accumulation(weights),
        "depth": render_expected_depth(weights, mid),
        "weights": weights,
        "spacing_starts": out["spacing_starts"],
        "spacing_ends": out["spacing_ends"],
        "weights_list": out["weights_list"],
        "spacing_list": out["spacing_list"],
    }


def nerfplayer_loss(params, statics, cfg, rng, rays_o, rays_d, rel, target,
                    train=True):
    """MSE + interlevel + distortion + temporal TV
    (nerfplayer_nerfacto.py:227-258)."""
    k_fwd, k_tv = jax.random.split(rng)
    out = nerfplayer_forward(params, statics, cfg, k_fwd, rays_o, rays_d,
                             rel, train)
    losses = {"rgb_loss": mse_loss(out["rgb"], target)}
    il = 0.0
    for (ws, (ss, se)) in zip(out["weights_list"], out["spacing_list"]):
        il = il + interlevel_loss(out["weights"], out["spacing_starts"],
                                  out["spacing_ends"], ws, ss, se)
    losses["interlevel_loss"] = cfg.interlevel_loss_mult * il
    losses["distortion_loss"] = cfg.distortion_loss_mult * distortion_loss(
        out["weights"], out["spacing_starts"], out["spacing_ends"])
    if cfg.temporal_tv_weight > 0:
        tv = temporal_tv_loss(params["field_emb"], statics["field_st"], k_tv)
        for emb, st in zip(params["prop_embs"], statics["prop_sts"]):
            tv = tv + temporal_tv_loss(emb, st, k_tv)
        losses["temporal_tv_loss"] = cfg.temporal_tv_weight * tv
    total = sum(losses.values())
    return total, (losses, out)


# ------------------------------------------------------- nerfplayer-ngp ----


@dataclasses.dataclass
class NerfplayerNGPConfig:
    """nerfplayer_ngp.py:48-84 — InstantNGP sampling + temporal field."""

    aabb_scale: float = 1.5
    grid_resolution: int = 64
    num_samples: int = 192
    temporal_dim: int = 64
    num_levels: int = 16
    level_dim: int = 2
    base_resolution: int = 16
    desired_resolution: int = 1024
    log2_hashmap_size: int = 19
    hidden_dim: int = 64
    geo_feat_dim: int = 15
    hidden_dim_color: int = 64
    temporal_tv_weight: float = 1.0
    background_color: str = "white"
    occ_threshold: float = 1e-2
    num_images: int = 1


def init_nerfplayer_ngp_params(cfg: NerfplayerNGPConfig, seed: int = 0,
                               camera_times: np.ndarray | None = None):
    rng = np.random.default_rng(seed)
    emb, st = make_temporal_grid(
        seed=int(rng.integers(1 << 31)), temporal_dim=cfg.temporal_dim,
        num_levels=cfg.num_levels, level_dim=cfg.level_dim,
        base_resolution=cfg.base_resolution,
        log2_hashmap_size=cfg.log2_hashmap_size,
        desired_resolution=cfg.desired_resolution)
    base_net = init_mlp(rng, cfg.num_levels * cfg.level_dim,
                        1 + cfg.geo_feat_dim, cfg.hidden_dim, 1)
    head = init_mlp(rng, 16 + cfg.geo_feat_dim, 3, cfg.hidden_dim_color, 2)
    if camera_times is None:
        camera_times = np.zeros((cfg.num_images,), np.float32)
    params = {"field_emb": emb, "base_net": base_net, "mlp_head": head}
    statics = {"field_st": st,
               "camera_times": jnp.asarray(camera_times, jnp.float32)}
    model_state = {"occ": jnp.ones(
        (cfg.grid_resolution,) * 3, jnp.float32)}
    return params, statics, model_state


def _ngp_density(params, statics, cfg, pos, t):
    p = jnp.clip((pos / (2 * cfg.aabb_scale)) + 0.5, 0.0, 1.0).reshape(-1, 3)
    feats = temporal_grid_encode(params["field_emb"], statics["field_st"],
                                 p, t.reshape(-1))
    h = apply_mlp(params["base_net"], feats)
    return trunc_exp(h[..., 0]).reshape(pos.shape[:-1]), h[..., 1:]


def update_ngp_occupancy(params, statics, model_state,
                         cfg: NerfplayerNGPConfig, rng):
    """EMA occupancy update with randomized times (nerfplayer_ngp.py:129-141
    updates through the sampler's occ grid; random times make a voxel count
    as occupied if it is occupied at ANY sampled time)."""
    res = cfg.grid_resolution
    k1, k2 = jax.random.split(rng)
    grid = jnp.stack(jnp.meshgrid(*([jnp.arange(res)] * 3),
                                  indexing="ij"), -1).reshape(-1, 3)
    cell = 2 * cfg.aabb_scale / res
    pos = (grid + jax.random.uniform(k1, grid.shape)) * cell - cfg.aabb_scale
    t = jax.random.uniform(k2, (pos.shape[0],))
    dens, _ = _ngp_density(params, statics, cfg, pos, t)
    occ = jnp.maximum(model_state["occ"] * 0.95,
                      dens.reshape(res, res, res))
    return {"occ": occ}


def nerfplayer_ngp_forward(params, statics, model_state,
                           cfg: NerfplayerNGPConfig, rng,
                           rays_o, rays_d, rel_camera_indices, train=True):
    r = rays_o.shape[0]
    times = statics["camera_times"][rel_camera_indices]
    aabb = cfg.aabb_scale
    nears, fars = near_far_collider(rays_o, rays_d, 0.05, 2 * 1.7321 * aabb)
    nears, fars = nears[:, 0], fars[:, 0]           # (R,)
    s = cfg.num_samples
    u = (jnp.arange(s) + 0.5) / s
    if train:
        u = u + (jax.random.uniform(rng, (r, s)) - 0.5) / s
    else:
        u = jnp.broadcast_to(u, (r, s))
    ts = nears[:, None] + (fars - nears)[:, None] * u
    pos = rays_o[:, None, :] + ts[..., None] * rays_d[:, None, :]
    # occupancy-grid skipping: zero density where the grid says empty
    res = cfg.grid_resolution
    cell_idx = jnp.clip(((pos / (2 * aabb) + 0.5) * res).astype(jnp.int32),
                        0, res - 1)
    occ = model_state["occ"][cell_idx[..., 0], cell_idx[..., 1],
                             cell_idx[..., 2]]
    keep = occ > cfg.occ_threshold
    t_b = jnp.broadcast_to(times[:, None], ts.shape)
    dens, geo = _ngp_density(params, statics, cfg, pos, t_b)
    dens = dens * keep
    d_enc = sh_encode_deg4(
        jnp.broadcast_to(rays_d[:, None, :], pos.shape).reshape(-1, 3))
    rgb_s = apply_mlp(params["mlp_head"],
                      jnp.concatenate([d_enc, geo], -1),
                      output_activation="sigmoid").reshape(r, s, 3)
    dt = (fars - nears)[:, None] / s
    weights, _, _ = get_weights_f2nerf(jnp.broadcast_to(dt, ts.shape), dens)
    rgb = render_rgb(weights, rgb_s, cfg.background_color)
    return {"rgb": rgb, "accumulation": render_accumulation(weights),
            "depth": render_expected_depth(weights, ts),
            "weights": weights}


def nerfplayer_ngp_loss(params, statics, model_state, cfg, rng,
                        rays_o, rays_d, rel, target, train=True):
    k_fwd, k_tv = jax.random.split(rng)
    out = nerfplayer_ngp_forward(params, statics, model_state, cfg, k_fwd,
                                 rays_o, rays_d, rel, train)
    losses = {"rgb_loss": mse_loss(out["rgb"], target)}
    if cfg.temporal_tv_weight > 0:
        losses["temporal_tv_loss"] = cfg.temporal_tv_weight * (
            temporal_tv_loss(params["field_emb"], statics["field_st"], k_tv))
    total = sum(losses.values())
    return total, (losses, out)
