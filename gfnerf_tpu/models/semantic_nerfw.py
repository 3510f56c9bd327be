"""Semantic NeRF-W (semantic head on the nerfacto pipeline).

TPU-native equivalent of ``nerfstudio/models/semantic_nerfw.py:58-300``: the
nerfacto proposal model plus a semantics MLP head fed by stop-gradiented
geometry features (``pass_semantic_gradients=False`` default, :104), a
``SemanticRenderer`` (weighted sum of per-sample logits), cross-entropy
supervision, and a colormap visualization of the argmax class.  The
reference's transient-embedding path raises ``ValueError("not fully
working")`` in their own code (:89-90) and is likewise not implemented.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gfnerf_tpu.fields.mlp import apply_mlp, init_mlp
from gfnerf_tpu.model_components.losses import (
    distortion_loss,
    interlevel_loss,
    mse_loss,
)
from gfnerf_tpu.models import nerfacto as nerfacto_mod


@dataclasses.dataclass
class SemanticNerfWConfig(nerfacto_mod.NerfactoConfig):
    num_semantic_classes: int = 2
    semantic_loss_weight: float = 1.0     # semantic_nerfw.py:64
    pass_semantic_gradients: bool = False


def init_semantic_nerfw_params(cfg: SemanticNerfWConfig, seed: int = 0):
    params, statics = nerfacto_mod.init_nerfacto_params(cfg, seed=seed)
    rng = np.random.default_rng(seed + 7)
    # semantics head: geo features -> 64 -> classes (semantic_nerfw.py:118-123)
    params["mlp_semantics"] = init_mlp(rng, cfg.geo_feat_dim, 64, 64, 1)
    params["semantics_head"] = init_mlp(rng, 64, cfg.num_semantic_classes,
                                        64, 0)
    return params, statics


def semantic_nerfw_forward(params, statics, cfg: SemanticNerfWConfig, rng,
                           rays_o, rays_d, rel, train=True):
    out = nerfacto_mod.nerfacto_forward(params, statics, cfg, rng,
                                        rays_o, rays_d, rel, train)
    # recompute geo features for the semantic head on the same samples is
    # wasteful; instead nerfacto_forward already renders with weights — we
    # re-derive per-sample geo by running the field once more would double
    # cost, so nerfacto_forward exposes "geo" below.
    geo = out["geo"]                       # (R, S, geo_feat_dim)
    sem_in = geo if cfg.pass_semantic_gradients else (
        jax.lax.stop_gradient(geo))
    x = apply_mlp(params["mlp_semantics"],
                  sem_in.reshape(-1, cfg.geo_feat_dim))
    logits = apply_mlp(params["semantics_head"], x).reshape(
        *geo.shape[:2], cfg.num_semantic_classes)
    # SemanticRenderer: weight-summed logits (renderers.py SemanticRenderer)
    out["semantics"] = jnp.sum(out["weights"][..., None] * logits, axis=1)
    return out


def semantic_nerfw_loss(params, statics, cfg, rng, rays_o, rays_d, rel,
                        target, semantics=None, train=True):
    out = semantic_nerfw_forward(params, statics, cfg, rng, rays_o, rays_d,
                                 rel, train)
    losses = {"rgb_loss": mse_loss(out["rgb"], target)}
    il = 0.0
    for (ws, (ss, se)) in zip(out["weights_list"], out["spacing_list"]):
        il = il + interlevel_loss(out["weights"], out["spacing_starts"],
                                  out["spacing_ends"], ws, ss, se)
    losses["interlevel_loss"] = cfg.interlevel_loss_mult * il
    losses["distortion_loss"] = cfg.distortion_loss_mult * distortion_loss(
        out["weights"], out["spacing_starts"], out["spacing_ends"])
    if semantics is not None:
        logp = jax.nn.log_softmax(out["semantics"], axis=-1)
        labels = jnp.clip(semantics.astype(jnp.int32), 0,
                          cfg.num_semantic_classes - 1)
        ce = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
        losses["semantics_loss"] = cfg.semantic_loss_weight * jnp.mean(ce)
    total = sum(losses.values())
    return total, (losses, out)


def semantics_colormap(logits: jnp.ndarray, colors: np.ndarray) -> jnp.ndarray:
    """argmax-class color visualization (semantic_nerfw.py:238-241)."""
    cls = jnp.argmax(logits, axis=-1)
    return jnp.asarray(colors)[cls]
