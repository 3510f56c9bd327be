"""TensoRF (VM decomposition).

TPU-native equivalent of ``nerfstudio/models/tensorf.py`` +
``nerfstudio/fields/tensorf_field.py`` with the vector-matrix (VM)
factorization: three feature planes (xy, xz, yz) paired with three feature
lines (z, y, x); the field value is the channel-wise product-sum.  Plane
lookups are bilinear gathers from small (res^2, C) tables — cheap on TPU
relative to hash tables (K x 12 gather rows per field query).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gfnerf_tpu.cameras.rays import get_weights_f2nerf
from gfnerf_tpu.fields.mlp import apply_mlp, init_mlp
from gfnerf_tpu.fields.sh_encoding import sh_encode_deg4
from gfnerf_tpu.model_components.losses import mse_loss
from gfnerf_tpu.model_components.ray_samplers import pdf_sample, spaced_sample
from gfnerf_tpu.model_components.renderers import (
    render_accumulation,
    render_expected_depth,
    render_rgb,
)
from gfnerf_tpu.model_components.scene_colliders import aabb_collider

PLANE_AXES = ((0, 1), (0, 2), (1, 2))   # matrix factors
LINE_AXES = (2, 1, 0)                   # paired vector factors


@dataclasses.dataclass
class TensoRFConfig:
    aabb_scale: float = 1.5
    resolution: int = 128
    density_channels: int = 16
    appearance_channels: int = 24
    appearance_dim: int = 27
    num_coarse_samples: int = 128
    num_fine_samples: int = 64
    hidden_dim: int = 128
    background_color: str = "white"
    l1_mult: float = 5e-4
    num_images: int = 1


def init_tensorf_params(cfg: TensoRFConfig, seed: int = 0):
    rng = np.random.default_rng(seed)
    r = cfg.resolution

    def planes(c):
        return [jnp.asarray(0.1 * rng.standard_normal((r, r, c)),
                            jnp.float32) for _ in range(3)]

    def lines(c):
        return [jnp.asarray(0.1 * rng.standard_normal((r, c)), jnp.float32)
                for _ in range(3)]

    return {
        "den_planes": planes(cfg.density_channels),
        "den_lines": lines(cfg.density_channels),
        "app_planes": planes(cfg.appearance_channels),
        "app_lines": lines(cfg.appearance_channels),
        "basis": jnp.asarray(
            0.1 * rng.standard_normal(
                (3 * cfg.appearance_channels, cfg.appearance_dim)),
            jnp.float32),
        "head": init_mlp(rng, cfg.appearance_dim + 16, 3, cfg.hidden_dim, 2),
    }


def _bilinear_plane(plane, u, v):
    """plane (R, R, C); u, v in [0, 1]. Returns (N, C)."""
    r = plane.shape[0]
    x = jnp.clip(u * (r - 1), 0, r - 1)
    y = jnp.clip(v * (r - 1), 0, r - 1)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, r - 1)
    y1 = jnp.minimum(y0 + 1, r - 1)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]
    p = plane.reshape(r * r, -1)
    f00 = p[x0 * r + y0]
    f01 = p[x0 * r + y1]
    f10 = p[x1 * r + y0]
    f11 = p[x1 * r + y1]
    return (f00 * (1 - fx) * (1 - fy) + f01 * (1 - fx) * fy
            + f10 * fx * (1 - fy) + f11 * fx * fy)


def _linear_line(line, t):
    r = line.shape[0]
    x = jnp.clip(t * (r - 1), 0, r - 1)
    x0 = jnp.floor(x).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, r - 1)
    f = (x - x0)[:, None]
    return line[x0] * (1 - f) + line[x1] * f


def _vm_features(planes, lines, p):
    """VM factor product-sum. p (N, 3) in [0, 1] -> (N, 3*C)."""
    feats = []
    for (a0, a1), la, plane, line in zip(PLANE_AXES, LINE_AXES, planes,
                                         lines):
        fp = _bilinear_plane(plane, p[:, a0], p[:, a1])
        fl = _linear_line(line, p[:, la])
        feats.append(fp * fl)
    return jnp.concatenate(feats, axis=-1)


def _aabb(cfg):
    return jnp.array([[-cfg.aabb_scale] * 3, [cfg.aabb_scale] * 3])


def tensorf_density(params, cfg, pos):
    aabb = _aabb(cfg)
    p = ((pos.reshape(-1, 3) - aabb[0]) / (aabb[1] - aabb[0]))
    p = jnp.clip(p, 0.0, 1.0)
    f = _vm_features(params["den_planes"], params["den_lines"], p)
    density = jax.nn.softplus(jnp.sum(f, axis=-1) - 1.0)
    return density.reshape(pos.shape[:-1]), p


def tensorf_forward(params, cfg: TensoRFConfig, rng, rays_o, rays_d,
                    train=True):
    r = rays_o.shape[0]
    aabb = _aabb(cfg)
    nears, fars = aabb_collider(rays_o, rays_d, aabb, near_plane=0.05)
    k1, k2 = (jax.random.split(rng) if rng is not None else (None, None))
    bs, be, ss, se = spaced_sample(k1 if train else None, nears, fars,
                                   cfg.num_coarse_samples,
                                   train_stratified=train)
    mid = (bs + be) / 2.0
    pos = rays_o[:, None, :] + mid[..., None] * rays_d[:, None, :]
    density, _ = tensorf_density(params, cfg, pos)
    w_coarse, _, _ = get_weights_f2nerf(be - bs, density)

    # importance refinement (tensorf.py uses a coarse/fine PDF pass)
    ss2, se2 = pdf_sample(k2 if train else None, ss, se, w_coarse,
                          cfg.num_fine_samples, include_original=True)
    bs2 = ss2 * fars + (1 - ss2) * nears
    be2 = se2 * fars + (1 - se2) * nears
    mid2 = (bs2 + be2) / 2.0
    pos2 = rays_o[:, None, :] + mid2[..., None] * rays_d[:, None, :]
    density2, p2 = tensorf_density(params, cfg, pos2)

    app = _vm_features(params["app_planes"], params["app_lines"], p2)
    app = app @ params["basis"]                       # (N, appearance_dim)
    d_enc = sh_encode_deg4(
        jnp.broadcast_to(rays_d[:, None, :], pos2.shape).reshape(-1, 3))
    rgb_s = apply_mlp(params["head"], jnp.concatenate([app, d_enc], -1),
                      output_activation="sigmoid").reshape(r, -1, 3)
    w, _, _ = get_weights_f2nerf(be2 - bs2, density2)
    return {
        "rgb": render_rgb(w, rgb_s, cfg.background_color),
        "accumulation": render_accumulation(w),
        "depth": render_expected_depth(w, mid2),
        "weights": w,
    }


def tensorf_loss(params, cfg, rng, rays_o, rays_d, target, train=True):
    out = tensorf_forward(params, cfg, rng, rays_o, rays_d, train)
    losses = {"rgb_loss": mse_loss(out["rgb"], target)}
    # L1 sparsity on the density factors (tensorf.py regularization)
    l1 = sum(jnp.mean(jnp.abs(p)) for p in params["den_planes"])
    l1 = l1 + sum(jnp.mean(jnp.abs(l)) for l in params["den_lines"])
    losses["l1_reg"] = cfg.l1_mult * l1
    return sum(losses.values()), (losses, out)
