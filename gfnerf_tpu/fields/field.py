"""GF-NeRF field: anchored hash encoding + density/color MLPs.

TPU-native equivalent of ``GFNeRFField`` (``gfnerf/nerfacto_field.py:73-603``):

- global ("init") anchored hash table + shared ``base_network``
  (32 -> hidden -> 1 + geo_feat_dim) (nerfacto_field.py:174-199),
- per-block *residual* hash tables added at the feature level in the focal
  stage (nerfacto_field.py:477-489),
- SH-degree-4 direction encoding + appearance embedding + ``mlp_head``
  (sigmoid RGB) (nerfacto_field.py:217-227, 509-591),
- density = ``trunc_exp(x + 1)`` masked by anchor validity
  (nerfacto_field.py:499-503),
- warped points normalized ``(p + 1.5) / 3`` (nerfacto_field.py:431).

Design differences (TPU):
- instead of paging one active block table between GPU and disk
  (nerfacto_field.py:248-404), ALL block tables live in one stacked array —
  updates are masked per active block by the optimizer, and the stacked axis
  is the natural ``block`` sharding axis on a multi-chip mesh;
- stage/freezing logic is expressed through optimizer masks rather than
  ``requires_grad`` mutation;
- parameters are split into a trainable pytree (:class:`FieldParams`, all
  float leaves — what jax.grad sees) and fixed state (:class:`FieldStatics`:
  uint32 hash primes + bias offsets).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gfnerf_tpu.fields.activations import trunc_exp
from gfnerf_tpu.fields.hash_encoding import (
    N_CHANNELS,
    N_LEVELS,
    hash_encode_raw,
    hash_encode_sorted,
    init_hash_params,
)
from gfnerf_tpu.fields.mlp import apply_mlp, init_mlp
from gfnerf_tpu.fields.sh_encoding import sh_encode_deg4
from gfnerf_tpu.utils.structs import dataclass, static_field

STAGE_INIT = 0
STAGE_BLOCK = 1


def _mlp_dt(cfg):
    """MLP compute dtype: the reference's MLPs ran in fp16 via tcnn
    FullyFusedMLP (SURVEY N6); bfloat16 is the TPU-native equivalent.
    Parameters and outputs stay float32 either way."""
    return jnp.bfloat16 if cfg.mlp_dtype == "bfloat16" else jnp.float32


import dataclasses as _dc


@_dc.dataclass
class FieldConfig:
    """Static field hyper-parameters (reference gfnerf/config.py:119-127).

    A plain (mutable) dataclass: it is closed over by the jitted step
    functions, never traced.
    """

    num_images: int = 1
    geo_feat_dim: int = 15
    hidden_dim: int = 128
    num_layers: int = 2
    hidden_dim_color: int = 128
    num_layers_color: int = 3
    appearance_embedding_dim: int = 32
    use_appearance_embedding: bool = True
    log2_hashmap_size: int = 21
    num_levels: int = N_LEVELS
    features_per_level: int = N_CHANNELS
    n_blocks: int = 10
    n_volumes: int = 1
    use_semantics: bool = False
    num_semantic_classes: int = 2
    camera_opt_mode: str = "off"   # "off" | "SO3xR3" | "SE3" (config.py:82-86)
    hash_layout: str = "anchored"  # "anchored" (exact parity) | "packed"
    """"packed": supercell-packed table rows — one wide gather per
    (point, level) instead of 8 corner gathers; the TPU-native fast layout
    (fields/packed_hash.py). "anchored" matches the reference's per-corner
    hashing exactly."""
    mlp_dtype: str = "float32"     # "bfloat16" = fp16-tcnn-class compute (N6)
    packed_rows_log2: int = 15
    packed_row_width: int = 128
    block_rows_log2: Optional[int] = None
    """Residual-table row count (log2) when it should differ from the global
    table's — e.g. small global + full-size residuals to reproduce the
    capacity-bound regime the focal stage exists for (the reference uses
    equal 2^21 tables but each block covers ~1/10 of the scene,
    gfnerf/config.py:119-127). None = packed_rows_log2. Row count is read
    from the table's own shape in the encode, so sizes may differ freely."""
    block_dense_levels: int = 0
    """First k RESIDUAL levels use collision-free linear addressing where
    the per-volume grid fits the table (packed layout only;
    packed_hash.dense_level_extents). QUALITY.md finding 7 fix (b): kills
    the surface/empty-space hash collisions that drive the focal fog
    overfit, at the cost of hash capacity flexibility on those levels."""
    focal_mode: str = "residual"   # "residual" | "finetune"
    """Focal-stage parameterization.  "residual": the reference's design —
    zero-initialized per-block tables ADDED to the frozen global features
    (nerfacto_field.py:477-489).  "finetune": a structurally different
    design (QUALITY.md findings 7-8 falsified the residual fixes at small
    scale): each block gets a full COPY of the trained global table
    (copied once at the init->focal transition) and fine-tunes it at low lr
    on its own cluster; the global table itself stays frozen as the
    trust-region anchor (GFNeRFModelConfig.finetune_trust_mult).  Same
    eval routing, same optimizer masking; the hash function (prims/biases)
    is shared with the global table so the copy starts bit-identical."""
    use_proposal: bool = False
    """Proposal-guided resampling probe (models/gfnerf.py): a tiny packed
    hash table + 1-layer MLP whose density concentrates the main field's
    samples at surfaces — the TPU-first answer to the budget-saturation
    failure mode (QUALITY.md finding 1): crisper geometry AND fewer main
    field rows than marching densely."""
    proposal_levels: int = 4
    proposal_rows_log2: int = 12
    warp_mode: str = "pers"   # "pers" (f2nerf warp) | "identity" (ablation:
    # world coords / identity_warp_scale fed to the hash instead of the
    # per-leaf perspective warp)
    identity_warp_scale: float = 6.0
    density_bias: float = 1.0
    """density = trunc_exp(x + density_bias) (reference hard-codes +1,
    nerfacto_field.py:499 — the scene starts as e^1 fog that must be carved;
    negative values start transparent instead)."""


@dataclass
class FieldParams:
    """Trainable parameters (all float leaves)."""

    global_feat: jnp.ndarray            # (L, local, C)
    block_feats: Optional[jnp.ndarray]  # (n_blocks, L, local, C)
    base_net: dict
    mlp_head: dict
    appearance_embedding: jnp.ndarray   # (num_images, D)
    mlp_semantics: Optional[dict] = None
    semantics_head: Optional[dict] = None
    camera_adjustment: Optional[jnp.ndarray] = None  # (num_images, 6) SE3/SO3xR3 tangents
    prop_feat: Optional[jnp.ndarray] = None   # (L_p, rows, G) packed probe
    prop_net: Optional[dict] = None


@dataclass
class FieldStatics:
    """Fixed hash state (never differentiated)."""

    global_prim: jnp.ndarray            # (L, V, 3) uint32
    global_bias: jnp.ndarray            # (L, V, 3) f32
    block_prims: Optional[jnp.ndarray]  # (n_blocks, L, V, 3) uint32
    block_biases: Optional[jnp.ndarray]  # (n_blocks, L, V, 3) f32
    prop_prim: Optional[jnp.ndarray] = None
    prop_bias: Optional[jnp.ndarray] = None


def init_field_params(cfg: FieldConfig, seed: int = 0):
    """Returns (FieldParams, FieldStatics)."""
    rng = np.random.default_rng(seed)
    feat_in = cfg.num_levels * cfg.features_per_level

    if cfg.hash_layout == "packed":
        from gfnerf_tpu.fields.packed_hash import init_packed_hash_params

        def make_table(mode, rows_log2=None):
            return init_packed_hash_params(
                seed=int(rng.integers(1 << 31)),
                n_rows_log2=(rows_log2 if rows_log2 is not None
                             else cfg.packed_rows_log2),
                n_volumes=cfg.n_volumes,
                n_levels=cfg.num_levels,
                n_channels=cfg.features_per_level,
                row_width=cfg.packed_row_width,
                init_mode=mode,
            )
    else:
        def make_table(mode, rows_log2=None):
            p = init_hash_params(
                seed=int(rng.integers(1 << 31)),
                log2_table_size=(rows_log2 if rows_log2 is not None
                                 else cfg.log2_hashmap_size),
                n_volumes=cfg.n_volumes,
                n_levels=cfg.num_levels,
                n_channels=cfg.features_per_level,
                init_mode=mode,
            )
            return p.feat_pool, p.prim_pool, p.bias_pool

    # reference resets the global table, zeros the residual tables
    # (nerfacto_field.py:200, :345)
    g_feat, g_prim, g_bias = make_table("reset")
    if cfg.n_blocks > 0 and cfg.focal_mode == "finetune":
        # per-block fine-tuned COPIES of the global table: same shape and
        # same hash function (prims/biases) so the transition copy is
        # bit-identical to the global encode.  Tables start zero and are
        # overwritten with the trained global at the init->focal
        # transition (pipeline.after_train_iteration).
        block_feats = jnp.zeros((cfg.n_blocks,) + g_feat.shape,
                                g_feat.dtype)
        block_prims = jnp.broadcast_to(
            g_prim[None], (cfg.n_blocks,) + g_prim.shape).copy()
        block_biases = jnp.broadcast_to(
            g_bias[None], (cfg.n_blocks,) + g_bias.shape).copy()
    elif cfg.n_blocks > 0:
        bts = [make_table("zero", cfg.block_rows_log2)
               for _ in range(cfg.n_blocks)]
        block_feats = jnp.stack([b[0] for b in bts], axis=0)
        block_prims = jnp.stack([b[1] for b in bts], axis=0)
        block_biases = jnp.stack([b[2] for b in bts], axis=0)
    else:
        block_feats = block_prims = block_biases = None

    base_net = init_mlp(
        rng, feat_in, 1 + cfg.geo_feat_dim, cfg.hidden_dim, cfg.num_layers - 1
    )
    head_in = 16 + cfg.geo_feat_dim + cfg.appearance_embedding_dim
    mlp_head = init_mlp(
        rng, head_in, 3, cfg.hidden_dim_color, cfg.num_layers_color - 1
    )
    appearance = rng.standard_normal(
        (cfg.num_images, cfg.appearance_embedding_dim)
    ).astype(np.float32)  # torch nn.Embedding default N(0, 1)

    mlp_semantics = semantics_head = None
    if cfg.use_semantics:
        mlp_semantics = init_mlp(rng, cfg.geo_feat_dim, 64, 64, 1)
        semantics_head = init_mlp(rng, 64, cfg.num_semantic_classes, 64, 0)

    prop_feat = prop_net = prop_prim = prop_bias = None
    if cfg.use_proposal:
        from gfnerf_tpu.fields.packed_hash import init_packed_hash_params

        prop_feat, prop_prim, prop_bias = init_packed_hash_params(
            seed=int(rng.integers(1 << 31)),
            n_rows_log2=cfg.proposal_rows_log2,
            n_volumes=cfg.n_volumes,
            n_levels=cfg.proposal_levels,
            n_channels=4,
            init_mode="reset",
        )
        prop_net = init_mlp(rng, cfg.proposal_levels * 4, 1, 16, 1)

    camera_adjustment = None
    if cfg.camera_opt_mode != "off":
        from gfnerf_tpu.cameras.camera_optimizers import init_pose_adjustment

        camera_adjustment = init_pose_adjustment(cfg.num_images)
    params = FieldParams(
        global_feat=g_feat,
        block_feats=block_feats,
        base_net=base_net,
        mlp_head=mlp_head,
        appearance_embedding=jnp.asarray(appearance),
        mlp_semantics=mlp_semantics,
        semantics_head=semantics_head,
        camera_adjustment=camera_adjustment,
        prop_feat=prop_feat,
        prop_net=prop_net,
    )
    statics = FieldStatics(
        global_prim=g_prim,
        global_bias=g_bias,
        block_prims=block_prims,
        block_biases=block_biases,
        prop_prim=prop_prim,
        prop_bias=prop_bias,
    )
    return params, statics


def field_density(
    params: FieldParams,
    statics: FieldStatics,
    cfg: FieldConfig,
    warp_pts: jnp.ndarray,   # (..., 3) warped-space points
    anchors: jnp.ndarray,    # (...,) int32 trans_idx, -1 invalid
    stage: int,              # STAGE_INIT | STAGE_BLOCK  (static)
    active_block: jnp.ndarray | int = 0,  # traced scalar, block-stage table index
    active_table: jnp.ndarray | None = None,  # explicit (L, local, C) table
    with_shared: bool = False,  # static; also return the shared-only density
):
    """Density + geometry features.

    Returns (density (...,), geo_feat (..., geo_feat_dim)); with
    ``with_shared`` (focal stage only) a third value — the density of the
    FROZEN shared branch alone (no residual), stop-gradiented — used by the
    empty-space penalty on residual density deltas (QUALITY.md finding 7
    fix (a)).

    ``active_table``: the focal train step passes the active residual table
    as its own differentiated argument (so Adam moments exist only for the
    active block — the reference likewise keeps exactly one block optimizer
    alive, nerfacto.py:448-489); when None the table is sliced from
    ``params.block_feats`` (eval/render path).
    """
    lead_shape = anchors.shape
    pts = ((warp_pts + 1.5) / 3.0).reshape(-1, 3)  # nerfacto_field.py:431
    anc = anchors.reshape(-1)

    if cfg.hash_layout == "packed":
        from gfnerf_tpu.fields.packed_hash import (
            pack_for_channels,
            packed_hash_encode,
        )

        pack = pack_for_channels(cfg.features_per_level, cfg.packed_row_width)

        def encode(table, prim, bias, dense_levels=0):
            return packed_hash_encode(table, prim, bias, pts, anc,
                                      cfg.features_per_level, pack,
                                      dense_levels)
    else:
        # hash_encode_sorted: bf16 pair-packed forward + custom VJP that
        # builds the table gradient by sort + prefix-diff instead of XLA's
        # serialized scatter-add (see hash_encoding.py + PERF_NOTES.md).
        def encode(table, prim, bias, dense_levels=0):
            return hash_encode_sorted(table, prim, bias, pts, anc)

    finetune = cfg.focal_mode == "finetune"
    shared_density = None
    # In finetune focal mode the block table REPLACES the global encode
    # (it is a fine-tuned copy), so the global encode is only computed when
    # its features are actually consumed.
    if stage == STAGE_INIT or not finetune or with_shared:
        gfeats = encode(params.global_feat, statics.global_prim,
                        statics.global_bias)
    if stage == STAGE_INIT:
        feats = gfeats
    else:
        if with_shared:
            # shared-only density for the density-delta penalty: one extra
            # base_net pass; entirely stop-gradiented (the shared branch is
            # frozen in the focal stage anyway).
            gsg = jax.lax.stop_gradient(gfeats)
            hs = apply_mlp(params.base_net, gsg, compute_dtype=_mlp_dt(cfg))
            shared_density = jax.lax.stop_gradient(
                trunc_exp(hs[..., 0] + cfg.density_bias) * (anc >= 0)
            ).reshape(lead_shape)
        table = (active_table if active_table is not None
                 else params.block_feats[active_block])
        # dense_levels changes the addressing, so it only applies to
        # residual tables (a fine-tuned copy must hash like the global)
        enc_b = encode(
            table,
            statics.block_prims[active_block],
            statics.block_biases[active_block],
            dense_levels=0 if finetune else cfg.block_dense_levels,
        )
        if finetune:
            feats = enc_b
        else:
            # Global branch frozen in focal stage (nerfacto_field.py:460-461);
            # stop_gradient additionally prunes its (large) backward scatter.
            feats = jax.lax.stop_gradient(gfeats) + enc_b

    h = apply_mlp(params.base_net, feats, compute_dtype=_mlp_dt(cfg))
    density_before, geo = h[..., :1], h[..., 1:]
    density = trunc_exp(density_before[..., 0] + cfg.density_bias)  # nerfacto_field.py:499
    density = density * (anc >= 0)
    out = (density.reshape(lead_shape),
           geo.reshape(*lead_shape, cfg.geo_feat_dim))
    if with_shared:
        return out + (shared_density,)
    return out


def field_density_routed(
    params: FieldParams,
    statics: FieldStatics,
    cfg: FieldConfig,
    warp_pts: jnp.ndarray,   # (..., 3) warped-space points
    anchors: jnp.ndarray,    # (...,) int32 trans_idx, -1 invalid
    blocks: jnp.ndarray,     # (...,) int32 per-point residual block
):
    """Focal density with PER-POINT block routing (packed layout, eval).

    shared encode + per-point-block residual (packed_hash_encode_routed):
    lets one eval chunk mix rays from every cluster — the TPU form of the
    reference's per-camera block routing (nerfacto_field.py:526-533) —
    instead of per-(split, nearest) groups padded to the chunk size.
    Forward-only (no table grads), so the raw encodes suffice.
    """
    assert cfg.hash_layout == "packed", "routed eval needs the packed layout"
    from gfnerf_tpu.fields.packed_hash import (
        pack_for_channels,
        packed_hash_encode,
        packed_hash_encode_routed,
    )

    lead_shape = anchors.shape
    pts = ((warp_pts + 1.5) / 3.0).reshape(-1, 3)
    anc = anchors.reshape(-1)
    blk = blocks.reshape(-1)
    pack = pack_for_channels(cfg.features_per_level, cfg.packed_row_width)
    if cfg.focal_mode == "finetune":
        # per-point fine-tuned table replaces the global encode entirely
        feats = packed_hash_encode_routed(
            params.block_feats, statics.block_prims, statics.block_biases,
            pts, anc, blk, cfg.features_per_level, pack, 0)
    else:
        feats = packed_hash_encode(
            params.global_feat, statics.global_prim, statics.global_bias,
            pts, anc, cfg.features_per_level, pack)
        feats = feats + packed_hash_encode_routed(
            params.block_feats, statics.block_prims, statics.block_biases,
            pts, anc, blk, cfg.features_per_level, pack,
            cfg.block_dense_levels)
    h = apply_mlp(params.base_net, feats, compute_dtype=_mlp_dt(cfg))
    density = trunc_exp(h[..., 0] + cfg.density_bias) * (anc >= 0)
    return (density.reshape(lead_shape),
            h[..., 1:].reshape(*lead_shape, cfg.geo_feat_dim))


def _head_ray_pre(params: FieldParams, cfg: FieldConfig,
                  dirs_ray: jnp.ndarray, rel_ray: jnp.ndarray):
    """Per-ray partial pre-activation of the color head's first layer.

    The head input is the concat [sh(dir) | geo | appearance]; splitting
    layer-1 as ``x @ W0 = sh @ W0[:16] + geo @ W0[16:16+G] + emb @ W0[16+G:]``
    lets the ray-constant terms (sh, emb, bias) be computed once per RAY and
    broadcast/gathered to samples — the (N, 16+G+D) concat buffer (the
    dominant head HBM traffic at N = R*S) never exists.  Exact up to float
    summation order.
    """
    dt = _mlp_dt(cfg)
    g = cfg.geo_feat_dim
    r = dirs_ray.shape[0]
    w0 = params.mlp_head["w"][0]
    b0 = params.mlp_head["b"][0]
    d_enc = sh_encode_deg4(dirs_ray)                    # (R, 16)
    pre = jnp.dot(d_enc.astype(dt), w0[:16].astype(dt),
                  preferred_element_type=dt)
    if cfg.use_appearance_embedding:
        emb = params.appearance_embedding[rel_ray]      # (R, D)
        pre = pre + jnp.dot(emb.astype(dt), w0[16 + g:].astype(dt),
                            preferred_element_type=dt)
    return pre + b0.astype(dt)                          # (R, H)


def _head_from_pre(params: FieldParams, cfg: FieldConfig,
                   geo: jnp.ndarray,        # (..., G)
                   ray_pre: jnp.ndarray):   # broadcastable to (..., H)
    """Finish the color head from the split first layer.

    Returns rgb flattened to (prod(...), 3)."""
    dt = _mlp_dt(cfg)
    g = cfg.geo_feat_dim
    w0 = params.mlp_head["w"][0]
    h = w0.shape[1]
    geo_pre = jnp.dot(geo.reshape(-1, g).astype(dt), w0[16:16 + g].astype(dt),
                      preferred_element_type=dt).reshape(geo.shape[:-1] + (h,))
    h1 = geo_pre + ray_pre
    return apply_mlp(params.mlp_head, h1.reshape(-1, h),
                     output_activation="sigmoid", compute_dtype=dt,
                     start_layer=1)


def _semantics_heads(params, cfg, geo_flat):
    sem_in = jax.lax.stop_gradient(geo_flat)  # pass_semantic_gradients=False
    x = apply_mlp(params.mlp_semantics, sem_in, compute_dtype=_mlp_dt(cfg))
    return apply_mlp(params.semantics_head, x, compute_dtype=_mlp_dt(cfg))


def field_rgb(
    params: FieldParams,
    cfg: FieldConfig,
    directions: jnp.ndarray,        # (..., 3) unit view dirs (per sample)
    geo_feat: jnp.ndarray,          # (..., geo_feat_dim)
    rel_camera_indices: jnp.ndarray,  # (...,) int32 appearance index (per sample)
    stage: int,
):
    """Color head. Returns dict with rgb (..., 3) (+ semantic logits)."""
    lead_shape = directions.shape[:-1]
    geo = geo_feat.reshape(-1, cfg.geo_feat_dim)
    ray_pre = _head_ray_pre(params, cfg, directions.reshape(-1, 3),
                            rel_camera_indices.reshape(-1))
    rgb = _head_from_pre(params, cfg, geo, ray_pre)
    out = {"rgb": rgb.reshape(*lead_shape, 3)}
    if cfg.use_semantics:
        logits = _semantics_heads(params, cfg, geo)
        out["semantics"] = logits.reshape(*lead_shape, cfg.num_semantic_classes)
    return out


def field_rgb_compact(
    params: FieldParams,
    cfg: FieldConfig,
    ray_pre: jnp.ndarray,           # (R, H) from _head_ray_pre
    geo_k: jnp.ndarray,             # (K, geo_feat_dim) compacted geo feats
    ray_k: jnp.ndarray,             # (K,) int32 source ray per sample
):
    """Color head for the compacted path: the per-ray first-layer partial is
    computed once on R rays, then gathered to the K valid samples (wide-row
    gather at the sweet spot) instead of re-encoding SH + embedding per
    sample."""
    rgb = _head_from_pre(params, cfg, geo_k, ray_pre[ray_k])
    out = {"rgb": rgb}
    if cfg.use_semantics:
        out["semantics"] = _semantics_heads(params, cfg, geo_k)
    return out


def field_rgb_per_ray(
    params: FieldParams,
    cfg: FieldConfig,
    dirs_ray: jnp.ndarray,          # (R, 3) unit view dirs (one per ray)
    geo_feat: jnp.ndarray,          # (R, S, geo_feat_dim)
    rel_ray: jnp.ndarray,           # (R,) int32 appearance index per ray
    stage: int,
):
    """Color head for the dense (R, S) path.

    Direction SH features and the appearance embedding are constant along a
    ray; with the split first layer their contribution is one (R, H) matmul
    broadcast over samples — no per-sample embedding gather, no (R*S, 16+G+D)
    concat buffer."""
    r, s, _ = geo_feat.shape
    ray_pre = _head_ray_pre(params, cfg, dirs_ray, rel_ray)  # (R, H)
    rgb = _head_from_pre(params, cfg, geo_feat, ray_pre[:, None, :])
    out = {"rgb": rgb.reshape(r, s, 3)}
    if cfg.use_semantics:
        logits = _semantics_heads(params, cfg, geo_feat.reshape(r * s, -1))
        out["semantics"] = logits.reshape(r, s, cfg.num_semantic_classes)
    return out


def proposal_density(
    params: FieldParams,
    statics: FieldStatics,
    cfg: FieldConfig,
    warp_pts: jnp.ndarray,   # (..., 3) warped-space points
    anchors: jnp.ndarray,    # (...,) int32 trans_idx, -1 invalid
):
    """Cheap density probe for proposal-guided resampling (tiny packed hash
    + 1-layer MLP). Same warped coordinate space + anchoring as the main
    field so the probe shares the octree's spatial decomposition."""
    from gfnerf_tpu.fields.packed_hash import (
        pack_for_channels,
        packed_hash_encode,
    )

    lead_shape = anchors.shape
    pts = ((warp_pts + 1.5) / 3.0).reshape(-1, 3)
    anc = anchors.reshape(-1)
    pack = pack_for_channels(4, cfg.packed_row_width)
    feats = packed_hash_encode(params.prop_feat, statics.prop_prim,
                               statics.prop_bias, pts, anc, 4, pack)
    h = apply_mlp(params.prop_net, feats, compute_dtype=_mlp_dt(cfg))
    density = trunc_exp(h[..., 0] + 1.0) * (anc >= 0)
    return density.reshape(lead_shape)
