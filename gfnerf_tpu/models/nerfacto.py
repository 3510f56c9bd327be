"""Nerfacto-class model (proposal-based), plus vanilla NeRF.

TPU-native equivalents of ``nerfstudio/models/nerfacto.py`` (proposal
sampler + hash field + scene contraction — BASELINE.json configs[0]) and
``nerfstudio/models/vanilla_nerf.py`` (frequency encoding + coarse/fine
MLPs).  Both use the plain (non-anchored) hash path: n_volumes=1, all
anchors 0.  These cover the stock-nerfstudio model family the reference
inherits (SURVEY.md §2.3); siblings (mipnerf, instant-ngp, tensorf, ...)
follow the same skeleton.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gfnerf_tpu.cameras.cameras import generate_rays_multi
from gfnerf_tpu.cameras.rays import get_weights_f2nerf
from gfnerf_tpu.fields.activations import trunc_exp
from gfnerf_tpu.fields.encodings import nerf_frequency_encode
from gfnerf_tpu.fields.hash_encoding import (
    hash_encode_sorted,
    init_hash_params,
)
from gfnerf_tpu.fields.mlp import apply_mlp, init_mlp
from gfnerf_tpu.fields.sh_encoding import sh_encode_deg4
from gfnerf_tpu.model_components.losses import (
    distortion_loss,
    interlevel_loss,
    mse_loss,
)
from gfnerf_tpu.model_components.ray_samplers import (
    proposal_sample,
    spaced_sample,
)
from gfnerf_tpu.model_components.renderers import (
    render_accumulation,
    render_expected_depth,
    render_rgb,
)
from gfnerf_tpu.model_components.scene_colliders import near_far_collider
from gfnerf_tpu.model_components.spatial_distortions import scene_contraction


@dataclasses.dataclass
class NerfactoConfig:
    near_plane: float = 0.05
    far_plane: float = 1000.0
    num_levels: int = 16
    log2_hashmap_size: int = 19
    hidden_dim: int = 64
    hidden_dim_color: int = 64
    geo_feat_dim: int = 15
    appearance_embedding_dim: int = 32
    num_proposal_samples: Tuple[int, ...] = (256, 96)
    num_nerf_samples: int = 48
    proposal_log2_hashmap_size: int = 17
    proposal_num_levels: int = 5
    interlevel_loss_mult: float = 1.0
    distortion_loss_mult: float = 0.002
    background_color: str = "last_sample"
    use_scene_contraction: bool = True
    num_images: int = 1


def init_nerfacto_params(cfg: NerfactoConfig, seed: int = 0):
    rng = np.random.default_rng(seed)
    field_table = init_hash_params(
        seed=int(rng.integers(1 << 31)), log2_table_size=cfg.log2_hashmap_size,
        n_volumes=1, n_levels=cfg.num_levels, init_mode="reset")
    props = []
    for _ in cfg.num_proposal_samples:
        props.append({
            "table": init_hash_params(
                seed=int(rng.integers(1 << 31)),
                log2_table_size=cfg.proposal_log2_hashmap_size,
                n_volumes=1, n_levels=cfg.proposal_num_levels,
                init_mode="reset"),
            "mlp": init_mlp(rng, cfg.proposal_num_levels * 2, 1, 16, 1),
        })
    base_net = init_mlp(rng, cfg.num_levels * 2, 1 + cfg.geo_feat_dim,
                        cfg.hidden_dim, 1)
    head = init_mlp(rng, 16 + cfg.geo_feat_dim + cfg.appearance_embedding_dim,
                    3, cfg.hidden_dim_color, 2)
    appearance = rng.standard_normal(
        (cfg.num_images, cfg.appearance_embedding_dim)).astype(np.float32)
    return {
        "field_feat": field_table.feat_pool,
        "prop_feats": [p["table"].feat_pool for p in props],
        "prop_mlps": [p["mlp"] for p in props],
        "base_net": base_net,
        "mlp_head": head,
        "appearance": jnp.asarray(appearance),
    }, {
        "field_prim": field_table.prim_pool,
        "field_bias": field_table.bias_pool,
        "prop_prims": [p["table"].prim_pool for p in props],
        "prop_biases": [p["table"].bias_pool for p in props],
    }


def _normalize_positions(pos, cfg):
    if cfg.use_scene_contraction:
        pos = scene_contraction(pos)       # [-2, 2]
        return (pos + 2.0) / 4.0
    return (pos + 2.0) / 4.0


def nerfacto_forward(params, statics, cfg: NerfactoConfig, rng,
                     rays_o, rays_d, rel_camera_indices, train: bool = True):
    r = rays_o.shape[0]
    nears, fars = near_far_collider(rays_o, rays_d, cfg.near_plane,
                                    cfg.far_plane)

    def make_density_fn(level):
        def fn(pos):
            p = _normalize_positions(pos, cfg).reshape(-1, 3)
            anc = jnp.zeros(p.shape[0], jnp.int32)
            feats = hash_encode_sorted(
                params["prop_feats"][level], statics["prop_prims"][level],
                statics["prop_biases"][level], p, anc)
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
    anc = jnp.zeros(p.shape[0], jnp.int32)
    feats = hash_encode_sorted(params["field_feat"], statics["field_prim"],
                               statics["field_bias"], p, anc)
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
    acc = render_accumulation(weights)
    depth = render_expected_depth(weights, mid)
    return {
        "rgb": rgb, "accumulation": acc, "depth": depth,
        "weights": weights,
        "geo": geo.reshape(r, -1, cfg.geo_feat_dim),
        "spacing_starts": out["spacing_starts"],
        "spacing_ends": out["spacing_ends"],
        "weights_list": out["weights_list"],
        "spacing_list": out["spacing_list"],
    }


def nerfacto_loss(params, statics, cfg, rng, rays_o, rays_d, rel, target,
                  train=True):
    out = nerfacto_forward(params, statics, cfg, rng, rays_o, rays_d, rel,
                           train)
    losses = {"rgb_loss": mse_loss(out["rgb"], target)}
    il = 0.0
    for (ws, (ss, se)) in zip(out["weights_list"], out["spacing_list"]):
        il = il + interlevel_loss(out["weights"], out["spacing_starts"],
                                  out["spacing_ends"], ws, ss, se)
    losses["interlevel_loss"] = cfg.interlevel_loss_mult * il
    losses["distortion_loss"] = cfg.distortion_loss_mult * distortion_loss(
        out["weights"], out["spacing_starts"], out["spacing_ends"])
    total = sum(losses.values())
    return total, (losses, out)


# ------------------------------------------------------------- vanilla NeRF ----


@dataclasses.dataclass
class VanillaNerfConfig:
    near_plane: float = 2.0
    far_plane: float = 6.0
    num_coarse_samples: int = 64
    num_importance_samples: int = 128
    pos_frequencies: int = 10
    dir_frequencies: int = 4
    hidden_dim: int = 256
    background_color: str = "white"


def init_vanilla_params(cfg: VanillaNerfConfig, seed: int = 0):
    rng = np.random.default_rng(seed)
    pos_dim = 3 * cfg.pos_frequencies * 2 + 3
    dir_dim = 3 * cfg.dir_frequencies * 2 + 3

    def field():
        return {
            "mlp1": init_mlp(rng, pos_dim, cfg.hidden_dim, cfg.hidden_dim, 3),
            "mlp2": init_mlp(rng, cfg.hidden_dim + pos_dim,
                             cfg.hidden_dim + 1, cfg.hidden_dim, 3),
            "head": init_mlp(rng, cfg.hidden_dim + dir_dim, 3,
                             cfg.hidden_dim // 2, 0),
        }

    return {"coarse": field(), "fine": field()}


def _vanilla_field(fp, cfg, pos, dirs):
    pe = nerf_frequency_encode(pos, cfg.pos_frequencies, 0.0,
                               cfg.pos_frequencies - 1, include_input=True)
    de = nerf_frequency_encode(dirs, cfg.dir_frequencies, 0.0,
                               cfg.dir_frequencies - 1, include_input=True)
    h = apply_mlp(fp["mlp1"], pe)
    h = jax.nn.relu(h)
    h2 = apply_mlp(fp["mlp2"], jnp.concatenate([h, pe], -1))
    density = jax.nn.relu(h2[..., 0])
    feat = jax.nn.relu(h2[..., 1:])
    rgb = apply_mlp(fp["head"], jnp.concatenate([feat, de], -1),
                    output_activation="sigmoid")
    return density, rgb


def vanilla_forward(params, cfg: VanillaNerfConfig, rng, rays_o, rays_d,
                    train=True):
    r = rays_o.shape[0]
    k1, k2 = (jax.random.split(rng) if rng is not None else (None, None))
    nears = jnp.full((r, 1), cfg.near_plane)
    fars = jnp.full((r, 1), cfg.far_plane)
    bs, be, ss, se = spaced_sample(k1 if train else None, nears, fars,
                                   cfg.num_coarse_samples,
                                   train_stratified=train)
    outs = {}
    for name, fp, bins in (("coarse", params["coarse"], (bs, be, ss, se)),):
        mid = (bins[0] + bins[1]) / 2.0
        pos = rays_o[:, None, :] + mid[..., None] * rays_d[:, None, :]
        dirs = jnp.broadcast_to(rays_d[:, None, :], pos.shape)
        density, rgb_s = _vanilla_field(fp, cfg, pos.reshape(-1, 3),
                                        dirs.reshape(-1, 3))
        density = density.reshape(r, -1)
        rgb_s = rgb_s.reshape(r, -1, 3)
        w, _, _ = get_weights_f2nerf(bins[1] - bins[0], density)
        outs[name] = {
            "rgb": render_rgb(w, rgb_s, cfg.background_color),
            "accumulation": render_accumulation(w),
            "depth": render_expected_depth(w, mid),
            "weights": w,
        }
        coarse_bins = bins
        coarse_w = w

    # fine pass: pdf resampling from coarse weights
    from gfnerf_tpu.model_components.ray_samplers import pdf_sample

    ss2, se2 = pdf_sample(k2 if train else None, coarse_bins[2],
                          coarse_bins[3], coarse_w,
                          cfg.num_importance_samples, include_original=True)
    bs2 = ss2 * fars + (1 - ss2) * nears
    be2 = se2 * fars + (1 - se2) * nears
    mid = (bs2 + be2) / 2.0
    pos = rays_o[:, None, :] + mid[..., None] * rays_d[:, None, :]
    dirs = jnp.broadcast_to(rays_d[:, None, :], pos.shape)
    density, rgb_s = _vanilla_field(params["fine"], cfg, pos.reshape(-1, 3),
                                    dirs.reshape(-1, 3))
    density = density.reshape(r, -1)
    rgb_s = rgb_s.reshape(r, -1, 3)
    w, _, _ = get_weights_f2nerf(be2 - bs2, density)
    outs["fine"] = {
        "rgb": render_rgb(w, rgb_s, cfg.background_color),
        "accumulation": render_accumulation(w),
        "depth": render_expected_depth(w, mid),
        "weights": w,
    }
    return outs


def vanilla_loss(params, cfg, rng, rays_o, rays_d, target, train=True):
    outs = vanilla_forward(params, cfg, rng, rays_o, rays_d, train)
    losses = {
        "rgb_loss_coarse": mse_loss(outs["coarse"]["rgb"], target),
        "rgb_loss_fine": mse_loss(outs["fine"]["rgb"], target),
    }
    return sum(losses.values()), (losses, outs)


# ---------------------------------------------------------- depth-nerfacto ----


def depth_nerfacto_loss(params, statics, cfg, rng, rays_o, rays_d, rel,
                        target, depth_gt=None, depth_loss_mult: float = 1e-3,
                        train=True):
    """Depth-supervised nerfacto (nerfstudio/models/depth_nerfacto.py):
    nerfacto losses + DS-NeRF depth likelihood on the termination depth
    when ground-truth depth rays are provided."""
    from gfnerf_tpu.model_components.losses import ds_nerf_depth_loss

    total, (losses, out) = nerfacto_loss(params, statics, cfg, rng, rays_o,
                                         rays_d, rel, target, train)
    if depth_gt is not None:
        mid = (out["spacing_starts"] + out["spacing_ends"]) / 2.0
        lengths = out["spacing_ends"] - out["spacing_starts"]
        losses["depth_loss"] = depth_loss_mult * ds_nerf_depth_loss(
            out["weights"], depth_gt, mid, lengths)
        total = total + losses["depth_loss"]
    return total, (losses, out)


# ------------------------------------------------------------------ mipnerf ----


@dataclasses.dataclass
class MipNerfConfig:
    near_plane: float = 2.0
    far_plane: float = 6.0
    num_coarse_samples: int = 128
    num_importance_samples: int = 128
    num_frequencies: int = 16
    dir_frequencies: int = 4
    hidden_dim: int = 256
    background_color: str = "white"


def integrated_pos_enc(means, covs_diag, num_frequencies: int):
    """Integrated positional encoding over gaussian frustum approximations
    (mip-NeRF eq. 7; nerfstudio encodings.NeRFEncoding with covs):
    E[sin(2^j x)] = sin(2^j mu) * exp(-0.5 * 4^j * sigma^2)."""
    freqs = 2.0 ** jnp.arange(num_frequencies)
    scaled = means[..., None, :] * freqs[:, None]            # (..., F, 3)
    var = covs_diag[..., None, :] * (freqs[:, None] ** 2)
    damp = jnp.exp(-0.5 * var)
    enc = jnp.concatenate([jnp.sin(scaled) * damp,
                           jnp.cos(scaled) * damp], axis=-1)
    return enc.reshape(*means.shape[:-1], -1)


def conical_frustum_gaussian(rays_o, rays_d, starts, ends, radius):
    """Mean/diagonal-cov gaussian of a conical frustum (mip-NeRF §3.1)."""
    mu = (starts + ends) / 2.0
    hw = (ends - starts) / 2.0
    common = hw ** 2 / jnp.maximum(3 * mu ** 2 + hw ** 2, 1e-10)
    t_mean = mu + 2 * mu * common
    t_var = hw ** 2 / 3 - (4 / 15) * (hw ** 4 * (12 * mu ** 2 - hw ** 2)
                                      / jnp.maximum(
                                          (3 * mu ** 2 + hw ** 2) ** 2, 1e-10))
    r_var = radius[..., None] ** 2 * (
        mu ** 2 / 4 + (5 / 12) * hw ** 2
        - (4 / 15) * hw ** 4 / jnp.maximum(3 * mu ** 2 + hw ** 2, 1e-10))
    means = rays_o[:, None, :] + t_mean[..., None] * rays_d[:, None, :]
    d2 = rays_d ** 2
    d2 = d2[:, None, :]
    d_norm2 = jnp.sum(d2, axis=-1, keepdims=True)
    covs = (t_var[..., None] * d2
            + r_var[..., None] * (1.0 - d2 / jnp.maximum(d_norm2, 1e-10)))
    return means, covs


def init_mipnerf_params(cfg: MipNerfConfig, seed: int = 0):
    rng = np.random.default_rng(seed)
    pos_dim = 3 * cfg.num_frequencies * 2
    dir_dim = 3 * cfg.dir_frequencies * 2 + 3
    # one shared MLP for both levels (mip-NeRF uses a single network)
    return {
        "mlp1": init_mlp(rng, pos_dim, cfg.hidden_dim, cfg.hidden_dim, 3),
        "mlp2": init_mlp(rng, cfg.hidden_dim + pos_dim, cfg.hidden_dim + 1,
                         cfg.hidden_dim, 3),
        "head": init_mlp(rng, cfg.hidden_dim + dir_dim, 3,
                         cfg.hidden_dim // 2, 0),
    }


def _mipnerf_level(params, cfg, rays_o, rays_d, radius, bs, be):
    means, covs = conical_frustum_gaussian(rays_o, rays_d, bs, be, radius)
    pe = integrated_pos_enc(means, covs, cfg.num_frequencies)
    de = nerf_frequency_encode(
        jnp.broadcast_to(rays_d[:, None, :], means.shape),
        cfg.dir_frequencies, 0.0, cfg.dir_frequencies - 1, include_input=True)
    h = jax.nn.relu(apply_mlp(params["mlp1"], pe))
    h2 = apply_mlp(params["mlp2"], jnp.concatenate([h, pe], -1))
    density = jax.nn.softplus(h2[..., 0] - 1.0)
    feat = jax.nn.relu(h2[..., 1:])
    rgb = apply_mlp(params["head"], jnp.concatenate([feat, de], -1),
                    output_activation="sigmoid")
    w, _, _ = get_weights_f2nerf(be - bs, density)
    mid = (bs + be) / 2.0
    return {
        "rgb": render_rgb(w, rgb, cfg.background_color),
        "accumulation": render_accumulation(w),
        "depth": render_expected_depth(w, mid),
        "weights": w,
    }


def mipnerf_forward(params, cfg: MipNerfConfig, rng, rays_o, rays_d,
                    pixel_area=None, train=True):
    r = rays_o.shape[0]
    k1, k2 = (jax.random.split(rng) if rng is not None else (None, None))
    nears = jnp.full((r, 1), cfg.near_plane)
    fars = jnp.full((r, 1), cfg.far_plane)
    radius = (jnp.sqrt(pixel_area[:, 0]) / 1.7320508 if pixel_area is not None
              else jnp.full((r,), 1e-3))
    bs, be, ss, se = spaced_sample(k1 if train else None, nears, fars,
                                   cfg.num_coarse_samples,
                                   train_stratified=train)
    coarse = _mipnerf_level(params, cfg, rays_o, rays_d, radius, bs, be)
    from gfnerf_tpu.model_components.ray_samplers import pdf_sample

    ss2, se2 = pdf_sample(k2 if train else None, ss, se, coarse["weights"],
                          cfg.num_importance_samples)
    bs2 = ss2 * fars + (1 - ss2) * nears
    be2 = se2 * fars + (1 - se2) * nears
    fine = _mipnerf_level(params, cfg, rays_o, rays_d, radius, bs2, be2)
    return {"coarse": coarse, "fine": fine}


def mipnerf_loss(params, cfg, rng, rays_o, rays_d, target, pixel_area=None,
                 train=True):
    outs = mipnerf_forward(params, cfg, rng, rays_o, rays_d, pixel_area,
                           train)
    losses = {
        "rgb_loss_coarse": 0.1 * mse_loss(outs["coarse"]["rgb"], target),
        "rgb_loss_fine": mse_loss(outs["fine"]["rgb"], target),
    }
    return sum(losses.values()), (losses, outs)
