"""GF-NeRF model: sampler + field + renderers + losses as one jitted step.

TPU-native equivalent of ``GFNeRFModel`` (``gfnerf/nerfacto.py:200-747``).
Where the reference composes torch modules called from a Python train loop,
here the whole iteration — ray generation, octree march, field, compositing,
losses, gradients, optimizer update and (init-stage) occupancy statistics —
is one compiled XLA program per stage.  Host code supplies the step-dependent
scalars (fineness, active block, rng key) as traced arguments.

Reference behaviors carried over:
- outputs rgb / accumulation / depth (expected, / scale_factor) / oct_depth
  (first octree hit, nerfacto.py:555-563),
- Charbonnier rgb loss + S3IM (nerfacto.py:628-679, config.py:97-102),
- occupancy stats + march-fineness updates during the init stage only
  (nerfacto.py:597-617),
- per-ray |error| summed over RGB for the focal-stage error maps
  (gf_pipeline.py:179-186).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from gfnerf_tpu.cameras.cameras import Cameras, generate_rays_multi
from gfnerf_tpu.cameras.rays import get_weights_f2nerf
from gfnerf_tpu.engine.optimizers import mask_frozen_grads
from gfnerf_tpu.fields.field import (
    STAGE_BLOCK,
    STAGE_INIT,
    FieldConfig,
    FieldParams,
    FieldStatics,
    field_density,
    field_rgb,
    field_rgb_per_ray,
)
from gfnerf_tpu.model_components.losses import charbonnier_loss, mse_loss, s3im_loss
from gfnerf_tpu.model_components.renderers import (
    render_accumulation,
    render_expected_depth,
    render_rgb,
)
from gfnerf_tpu.sampler.perssampler import (
    OctreeDevice,
    SamplerConfig,
    get_samples,
    update_oct_nodes,
    warp_points,
)
from gfnerf_tpu.utils.structs import dataclass, static_field


def _warp_or_identity(field_cfg, oct_dev, anchors_clipped, world_pts):
    """warp_points, or the identity-warp ablation (FieldConfig.warp_mode)."""
    if field_cfg.warp_mode == "identity":
        return jnp.clip(world_pts / field_cfg.identity_warp_scale, -1.5, 1.5)
    return warp_points(oct_dev, anchors_clipped, world_pts)


def sample_rays(oct_dev, rays_o, rays_d, noise_unscaled, fineness,
                scfg: SamplerConfig):
    """Dispatch between the vectorized leaf-list march ("fast") and the
    sequential point-location march ("scan"). noise_unscaled in [0.5, 1.5]."""
    if scfg.march == "fast":
        from gfnerf_tpu.sampler.fast_march import get_samples_fast

        return get_samples_fast(oct_dev, rays_o, rays_d, noise_unscaled,
                                fineness, scfg)
    return get_samples(oct_dev, rays_o, rays_d, noise_unscaled * fineness,
                       scfg)


import dataclasses as _dc


@_dc.dataclass
class GFNeRFModelConfig:
    """Static model hyper-parameters (gfnerf/config.py:88-130).

    Plain mutable dataclass: closed over by the jitted steps, never traced.
    """

    n_blocks: int = 10
    n_split_dataset: int = 10
    steps_per_split_dataset: int = 10000
    steps_perssampler_init: int = 30000
    scale_factor: float = 10.0
    background_color: str = "black"
    use_ch_loss: bool = True
    s3im_loss_mult: float = 1.0
    s3im_kernel_size: int = 4
    s3im_stride: int = 4
    s3im_repeat_time: int = 10
    s3im_patch_height: int = 32
    use_semantics: bool = False
    semantic_loss_weight: float = 0.0
    num_proposal_resamples: int = 0
    """Proposal-guided resampling (> 0 enables; needs
    FieldConfig.use_proposal): the marched lattice feeds a cheap density
    probe, whose transmittance weights importance-resample this many fine
    samples for the main field. Fixes the budget-saturation failure
    (QUALITY.md finding 1) — samples concentrate at surfaces — while
    cutting main-field hash rows. A TPU-first improvement over the
    reference's occupancy-only march."""
    proposal_interlevel_mult: float = 1.0
    distortion_loss_mult: float = 0.0
    """mip-NeRF-360 distortion regularizer on the fine weights (proposal
    path only): prunes floaters/fog. The reference model lacks it; it is a
    TPU-repo addition toggled per config."""
    samples_budget_per_ray: int = 256
    """Compaction budget: the field is evaluated only on valid samples,
    gathered into a fixed (R * budget) buffer and scattered back — the TPU
    equivalent of the reference's valid-mask indexing
    (nerfacto_field.py:444,454). Matches num_nerf_samples_per_ray=256
    (gfnerf/config.py:122). 0 disables compaction (dense evaluation)."""
    empty_space_penalty_mult: float = 0.0
    """> 0 adds a FOCAL-stage penalty on residual density added in empty
    space: relu(density_focal - density_shared) averaged over samples the
    frozen shared branch deems empty (alpha_shared < empty_space_tau).
    QUALITY.md finding 7 fix (a) for the fog-overfit mechanism: residual
    rows hash-shared between surface and empty cells get no corrective
    gradient from cluster-only supervision; this penalty supplies it."""
    empty_space_tau: float = 0.01
    """Shared-branch alpha below which a sample counts as empty space for
    the penalty above."""
    finetune_trust_mult: float = 0.0
    """> 0 with focal_mode="finetune": L2 trust-region pull of the active
    fine-tuned table toward the frozen global table it was copied from —
    sum((table - global)^2) * mult.  Bounds how far cluster-only
    supervision can drag the copy from the init state whose generalization
    it inherits (the finetune answer to the residual fog overfit,
    QUALITY.md findings 7-8)."""
    remat_chunks: int = 0
    """> 1 rematerializes the compacted field evaluation in this many
    point-chunks (``lax.map`` over a ``jax.checkpoint``-ed body): the
    backward pass recomputes the hash-encode gathers chunk by chunk instead
    of saving residuals for all R*budget points at once.  ~2x encode-forward
    FLOPs for a ~remat_chunks-fold cut in encode activation memory — the
    HBM lever for the paper-default workload (8192 rays x 1024 samples,
    2^21x16 tables: results/midscale/train_phase1.log OOM'd at 16.57G of
    15.75G without it).  Must divide R * samples_budget_per_ray."""


@dataclass
class TrainState:
    params: FieldParams
    opt_state: optax.OptState
    step: jnp.ndarray  # () int32


def model_forward(
    params: FieldParams,
    statics: FieldStatics,
    field_cfg: FieldConfig,
    model_cfg: GFNeRFModelConfig,
    samples,                    # WarpedSamples
    rays_d: jnp.ndarray,        # (R, 3)
    rel_camera_indices: jnp.ndarray,  # (R,) int32
    stage: int,
    active_block,
    oct_dev: Optional[OctreeDevice] = None,
    warp_deferred: bool = False,
    active_table=None,
    rays_o: Optional[jnp.ndarray] = None,
    rng: Optional[jax.Array] = None,
    routed_blocks: Optional[jnp.ndarray] = None,  # (R,) per-ray block (eval)
):
    """Field + compositing for one ray batch (GFNeRFModel.get_outputs,
    nerfacto.py:522-619).

    routed_blocks: per-ray residual block ids (packed layout, eval only) —
    the chunk may mix rays from every cluster; each point reads its own
    ray's block table (fields.field.field_density_routed).

    warp_deferred: the fast march leaves warp_pts empty; warped coords are
    computed here (after compaction) from world_pts + trans_idx, cutting the
    warp-table gathers down to the valid subset.

    rays_o + rng enable the proposal-resampling path
    (num_proposal_resamples > 0): fine sample positions are re-derived from
    ray origins, and rng stratifies the resampling during training.
    """
    r, s = samples.trans_idx.shape
    n_trans = oct_dev.w2xz.shape[0] if oct_dev is not None else 1
    budget = model_cfg.samples_budget_per_ray
    with_shared = (stage == STAGE_BLOCK
                   and model_cfg.empty_space_penalty_mult > 0
                   and routed_blocks is None)   # penalty is train-only
    if budget > 0 and budget < s:
        # Compaction: evaluate the field only on valid samples.  The
        # reference indexes by valid_mask (dynamic shapes); on TPU we gather
        # into a fixed (R*budget) buffer and scatter results back.
        k = r * budget
        # Per-ray cap: keep each ray's first `budget` valid samples, like the
        # reference's per-ray num_nerf_samples_per_ray=256 (config.py:122).
        # A batch-global first-come fill would silently strip ALL samples
        # from rays late in the batch whenever the batch total exceeds k.
        cum = jnp.cumsum(samples.valid.astype(jnp.int32), axis=1)
        flat_valid = (samples.valid & (cum <= budget)).reshape(-1)
        (idx,) = jnp.nonzero(flat_valid, size=k, fill_value=r * s)
        pad = idx >= r * s
        safe = jnp.minimum(idx, r * s - 1)
        anc_k = jnp.where(pad, -1, samples.trans_idx.reshape(-1)[safe])
        if warp_deferred:
            world_k = samples.world_pts.reshape(-1, 3)[safe]
            warp_k = _warp_or_identity(
                field_cfg, oct_dev, jnp.clip(anc_k, 0, n_trans - 1), world_k)
        else:
            warp_k = samples.warp_pts.reshape(-1, 3)[safe]
        ray_k = safe // s
        from gfnerf_tpu.fields.field import _head_ray_pre, field_rgb_compact

        ray_pre = _head_ray_pre(params, field_cfg, rays_d,
                                rel_camera_indices)
        n_chunks = model_cfg.remat_chunks
        if routed_blocks is not None and stage == STAGE_BLOCK:
            from gfnerf_tpu.fields.field import field_density_routed

            blk_k = jnp.where(pad, -1, routed_blocks[ray_k])
            density_k, geo_k = field_density_routed(
                params, statics, field_cfg, warp_k, anc_k, blk_k)
            shared_k = None
            heads_k = field_rgb_compact(params, field_cfg, ray_pre, geo_k,
                                        ray_k)
        elif n_chunks > 1:
            # Rematerialized evaluation: lax.map over point-chunks with a
            # checkpointed body — the backward recomputes each chunk's
            # encode gathers + head MLP instead of saving residuals for all
            # k points (see GFNeRFModelConfig.remat_chunks).
            assert k % n_chunks == 0, (
                f"remat_chunks={n_chunks} must divide "
                f"rays*budget={k}")

            @jax.checkpoint
            def _chunk_eval(ch):
                warp_c, anc_c, ray_c = ch
                dc = field_density(
                    params, statics, field_cfg, warp_c, anc_c, stage,
                    active_block, active_table=active_table,
                    with_shared=with_shared)
                heads_c = field_rgb_compact(params, field_cfg, ray_pre,
                                            dc[1], ray_c)
                return (dc[0], dc[2], heads_c) if with_shared else (
                    dc[0], heads_c)

            kc = k // n_chunks
            outs = jax.lax.map(_chunk_eval,
                               (warp_k.reshape(n_chunks, kc, 3),
                                anc_k.reshape(n_chunks, kc),
                                ray_k.reshape(n_chunks, kc)))
            if with_shared:
                density_k, shared_k, heads_k = outs
                shared_k = shared_k.reshape(k)
            else:
                density_k, heads_k = outs
                shared_k = None
            density_k = density_k.reshape(k)
            heads_k = {name: val.reshape(k, *val.shape[2:])
                       for name, val in heads_k.items()}
        else:
            dk = field_density(
                params, statics, field_cfg, warp_k, anc_k, stage,
                active_block, active_table=active_table,
                with_shared=with_shared)
            density_k, geo_k = dk[0], dk[1]
            shared_k = dk[2] if with_shared else None
            heads_k = field_rgb_compact(params, field_cfg, ray_pre, geo_k,
                                        ray_k)
        density = (jnp.zeros((r * s,))
                   .at[idx].set(density_k, mode="drop").reshape(r, s))
        density_shared = (
            jnp.zeros((r * s,)).at[idx].set(shared_k, mode="drop")
            .reshape(r, s) if with_shared else None)
        heads = {
            name: (jnp.zeros((r * s,) + val.shape[1:])
                   .at[idx].set(val, mode="drop")
                   .reshape(r, s, *val.shape[1:]))
            for name, val in heads_k.items()
        }
    elif (model_cfg.num_proposal_resamples > 0
          and params.prop_feat is not None and rays_o is not None):
        return _model_forward_proposal(
            params, statics, field_cfg, model_cfg, samples, rays_o, rays_d,
            rel_camera_indices, stage, active_block, oct_dev, active_table,
            rng)
    else:
        if warp_deferred:
            anc = jnp.clip(samples.trans_idx.reshape(-1), 0, n_trans - 1)
            warp = _warp_or_identity(field_cfg, oct_dev, anc,
                                     samples.world_pts.reshape(-1, 3)
                                     ).reshape(r, s, 3)
        else:
            warp = samples.warp_pts
        n_chunks = model_cfg.remat_chunks
        if routed_blocks is not None and stage == STAGE_BLOCK:
            from gfnerf_tpu.fields.field import field_density_routed

            blk_s = jnp.broadcast_to(routed_blocks[:, None], (r, s))
            density, geo = field_density_routed(
                params, statics, field_cfg, warp, samples.trans_idx, blk_s)
            density_shared = None
            heads = field_rgb_per_ray(params, field_cfg, rays_d, geo,
                                      rel_camera_indices, stage)
        elif n_chunks > 1:
            # Dense-path remat: chunk over RAYS (the compacted path above
            # chunks over points) — see GFNeRFModelConfig.remat_chunks.
            assert r % n_chunks == 0, (
                f"remat_chunks={n_chunks} must divide rays={r}")

            @jax.checkpoint
            def _ray_chunk_eval(ch):
                warp_c, anc_c, rays_d_c, cam_c = ch
                dd = field_density(
                    params, statics, field_cfg, warp_c, anc_c, stage,
                    active_block, active_table=active_table,
                    with_shared=with_shared)
                heads_c = field_rgb_per_ray(params, field_cfg, rays_d_c,
                                            dd[1], cam_c, stage)
                return (dd[0], dd[2], heads_c) if with_shared else (
                    dd[0], heads_c)

            rc = r // n_chunks
            outs = jax.lax.map(
                _ray_chunk_eval,
                (warp.reshape(n_chunks, rc, s, 3),
                 samples.trans_idx.reshape(n_chunks, rc, s),
                 rays_d.reshape(n_chunks, rc, 3),
                 rel_camera_indices.reshape(n_chunks, rc)))
            if with_shared:
                density, density_shared, heads = outs
                density_shared = density_shared.reshape(r, s)
            else:
                density, heads = outs
                density_shared = None
            density = density.reshape(r, s)
            heads = {name: val.reshape(r, s, *val.shape[3:])
                     for name, val in heads.items()}
        else:
            dd = field_density(
                params, statics, field_cfg, warp, samples.trans_idx,
                stage, active_block, active_table=active_table,
                with_shared=with_shared,
            )
            density, geo = dd[0], dd[1]
            density_shared = dd[2] if with_shared else None
            heads = field_rgb_per_ray(params, field_cfg, rays_d, geo,
                                      rel_camera_indices, stage)

    # fused Pallas compositing (weights + alphas + rgb + acc + depth in one
    # VMEM pass); falls back to the jnp path off-TPU or on unsupported shapes
    from gfnerf_tpu.ops.pallas.composite import fused_composite

    weights, alphas, rgb, acc, depth = fused_composite(
        density, samples.dists, samples.ts, heads["rgb"])
    if model_cfg.background_color == "white":
        rgb = rgb + (1.0 - acc)
    elif model_cfg.background_color == "last_sample":
        rgb = rgb + (1.0 - acc) * heads["rgb"][..., -1, :]
    depth = depth / model_cfg.scale_factor
    oct_depth = samples.first_oct_dis[:, None] / model_cfg.scale_factor

    out = {
        "rgb": rgb, "accumulation": acc, "depth": depth,
        "oct_depth": oct_depth, "weights": weights, "alphas": alphas,
    }
    if with_shared and density_shared is not None:
        out["density"] = density
        out["density_shared"] = density_shared
    if model_cfg.use_semantics and "semantics" in heads:
        from gfnerf_tpu.model_components.renderers import render_weighted

        out["semantics"] = render_weighted(weights, heads["semantics"])
    return out


def _model_forward_proposal(params, statics, field_cfg, model_cfg, samples,
                            rays_o, rays_d, rel_camera_indices, stage,
                            active_block, oct_dev, active_table, rng):
    """Proposal-guided resampling on top of the octree march.

    1. the marched lattice (coverage) feeds the cheap probe density,
    2. its transmittance weights importance-resample K fine samples,
    3. the main field runs only on the K fine samples (anchors inherited
       from each fine sample's enclosing marched segment),
    4. the probe trains against the fine weights via the interlevel loss
       (out["prop_*"], consumed by the train step).
    """
    from gfnerf_tpu.fields.field import proposal_density
    from gfnerf_tpu.model_components.ray_samplers import pdf_sample

    r, s = samples.trans_idx.shape
    k = model_cfg.num_proposal_resamples
    n_trans = oct_dev.w2xz.shape[0]

    # The march emits leaf-ordered lattices whose t values can regress a
    # little across overlapping leaves; the PDF resampler needs a strictly
    # ordered histogram, so sort each ray's samples by t (invalid to the
    # end) and carry anchors/validity/dists along.
    order = jnp.argsort(jnp.where(samples.valid, samples.ts, jnp.inf),
                        axis=1)
    ts_m = jnp.take_along_axis(samples.ts, order, axis=1)
    de_m = jnp.take_along_axis(samples.dists, order, axis=1)
    anc_m = jnp.take_along_axis(samples.trans_idx, order, axis=1)
    valid = jnp.take_along_axis(samples.valid, order, axis=1)
    world_m = jnp.take_along_axis(
        samples.world_pts, order[..., None], axis=1)

    anc_flat = jnp.clip(anc_m.reshape(-1), 0, n_trans - 1)
    warp_m = _warp_or_identity(field_cfg, oct_dev, anc_flat,
                               world_m.reshape(-1, 3)).reshape(r, s, 3)
    dens_p = proposal_density(params, statics, field_cfg, warp_m, anc_m)

    # monotone per-ray segment bounds: invalid tail slots collapse to t_max
    t_max = jnp.max(jnp.where(valid, ts_m + de_m, 0.0),
                    axis=1, keepdims=True)
    ts_fix = jnp.where(valid, ts_m, t_max)
    # enforce monotone bin edges; contiguous bins (end = next start) keep
    # the histogram well-formed even when leaf lattices overlap slightly
    ts_fix = jax.lax.cummax(ts_fix, axis=1)
    de_fix = jnp.where(valid, de_m, 0.0)
    ends_fix = jnp.concatenate(
        [ts_fix[:, 1:], ts_fix[:, -1:] + de_fix[:, -1:]], axis=1)
    w_prop, a_prop, _ = get_weights_f2nerf(de_fix, dens_p)

    bs, be = pdf_sample(rng, ts_fix, ends_fix, w_prop, k)
    t_f = (bs + be) / 2.0                                  # (R, K)
    # enclosing marched segment -> anchor (fine ts lie within marched bins)
    seg = jnp.clip(jnp.sum((t_f[:, :, None] >= ts_fix[:, None, :]),
                           axis=-1) - 1, 0, s - 1)         # (R, K)
    anc_f = jnp.take_along_axis(anc_m, seg, axis=1)
    anc_f = jnp.where(jnp.take_along_axis(valid, seg, axis=1), anc_f, -1)
    pos_f = rays_o[:, None, :] + t_f[..., None] * rays_d[:, None, :]
    warp_f = _warp_or_identity(
        field_cfg, oct_dev, jnp.clip(anc_f.reshape(-1), 0, n_trans - 1),
        pos_f.reshape(-1, 3)).reshape(r, k, 3)

    density, geo = field_density(
        params, statics, field_cfg, warp_f, anc_f, stage, active_block,
        active_table=active_table)
    heads = field_rgb_per_ray(params, field_cfg, rays_d, geo,
                              rel_camera_indices, stage)

    from gfnerf_tpu.ops.pallas.composite import fused_composite

    weights, alphas, rgb, acc, depth = fused_composite(
        density, be - bs, t_f, heads["rgb"])
    if model_cfg.background_color == "white":
        rgb = rgb + (1.0 - acc)
    elif model_cfg.background_color == "last_sample":
        rgb = rgb + (1.0 - acc) * heads["rgb"][..., -1, :]
    depth = depth / model_cfg.scale_factor
    oct_depth = samples.first_oct_dis[:, None] / model_cfg.scale_factor
    out = {
        "rgb": rgb, "accumulation": acc, "depth": depth,
        "oct_depth": oct_depth, "weights": weights, "alphas": alphas,
        # interlevel supervision: probe histogram vs fine weights
        "prop_weights": w_prop,
        "prop_spacing": (ts_fix, ends_fix),
        "fine_spacing": (bs, be),
        # probe weights live on the marched lattice: the right shape AND
        # semantics for the octree occupancy statistics
        "march_weights": w_prop,
        "march_alphas": a_prop,
    }
    if model_cfg.use_semantics and "semantics" in heads:
        from gfnerf_tpu.model_components.renderers import render_weighted

        out["semantics"] = render_weighted(weights, heads["semantics"])
    return out


def make_train_step(
    field_cfg: FieldConfig,
    model_cfg: GFNeRFModelConfig,
    sampler_cfg: SamplerConfig,
    tx: optax.GradientTransformation,
    stage: int,
):
    """Build the jitted train step for one stage (init or block)."""
    body = _train_step_body(field_cfg, model_cfg, sampler_cfg, tx, stage)
    return functools.partial(jax.jit, donate_argnums=(0, 2))(body)


def _train_step_body(
    field_cfg: FieldConfig,
    model_cfg: GFNeRFModelConfig,
    sampler_cfg: SamplerConfig,
    tx: optax.GradientTransformation,
    stage: int,
):
    """The un-jitted single-step computation (shared by the jitted
    single-step and the scanned multi-step wrappers)."""

    def train_step(
        state: TrainState,
        statics: FieldStatics,
        oct_dev: OctreeDevice,
        cameras: Cameras,            # full train cameras
        batch: dict,                 # device arrays from the datamanager
        fineness: jnp.ndarray,       # () f32 march fineness
        active_block: jnp.ndarray,   # () i32
        rng: jax.Array,
    ):
        rays = generate_rays_multi(cameras, batch["camera_indices"],
                                   batch["coords"])
        r = batch["coords"].shape[0]
        k_noise, k_s3im, k_prop = jax.random.split(rng, 3)
        noise = ((jax.random.uniform(k_noise, (r, sampler_cfg.max_samples))
                  - 0.5) + 1.0)  # PersSampler_cuda GetSamples:385-389
        samples = sample_rays(oct_dev, rays["origins"], rays["directions"],
                              noise, fineness, sampler_cfg)
        # sample positions are not optimized (the reference's CUDA sampler
        # has no autograd either); without this the backward pass would
        # retrace the whole march graph just to drop the cotangents
        samples = jax.lax.stop_gradient(samples)
        deferred = sampler_cfg.march == "fast"

        target = batch["image"]
        params_nb = state.params.replace(block_feats=None)
        if state.params.block_feats is not None:
            active_table = state.params.block_feats[active_block]
        else:
            active_table = jnp.zeros((1, 1, 2))

        def loss_fn(params, active_table):
            rays_o, rays_d = rays["origins"], rays["directions"]
            if params.camera_adjustment is not None:
                from gfnerf_tpu.cameras.camera_optimizers import (
                    CameraOptimizerConfig, apply_to_rays)

                rays_o, rays_d = apply_to_rays(
                    CameraOptimizerConfig(mode=field_cfg.camera_opt_mode),
                    params.camera_adjustment, batch["camera_indices"],
                    rays_o, rays_d)
            out = model_forward(
                params, statics, field_cfg, model_cfg, samples,
                rays_d, batch["rel_camera_indices"],
                stage, active_block, oct_dev=oct_dev, warp_deferred=deferred,
                active_table=(active_table
                              if state.params.block_feats is not None
                              else None),
                rays_o=rays_o, rng=k_prop,
            )
            if model_cfg.use_ch_loss:
                rgb_loss = charbonnier_loss(out["rgb"], target)
            else:
                rgb_loss = mse_loss(out["rgb"], target)
            losses = {"rgb_loss": rgb_loss}
            if (stage == STAGE_BLOCK
                    and field_cfg.focal_mode == "finetune"
                    and model_cfg.finetune_trust_mult > 0
                    and state.params.block_feats is not None):
                anchor = jax.lax.stop_gradient(params.global_feat)
                losses["trust_loss"] = (
                    model_cfg.finetune_trust_mult
                    * jnp.mean((active_table - anchor) ** 2))
            if "density_shared" in out:
                # finding-7 fix (a): penalize residual density ADDED where
                # the frozen shared branch says empty — the fog mode's
                # signature.  Carving (negative delta) stays free.
                ds = out["density_shared"]
                alpha_s = 1.0 - jnp.exp(-ds * samples.dists)
                empty = ((alpha_s < model_cfg.empty_space_tau)
                         & samples.valid).astype(ds.dtype)
                delta = jax.nn.relu(out["density"] - ds)
                losses["empty_space_loss"] = (
                    model_cfg.empty_space_penalty_mult
                    * jnp.sum(delta * empty)
                    / jnp.maximum(jnp.sum(empty), 1.0))
            if "prop_weights" in out:
                from gfnerf_tpu.model_components.losses import (
                    distortion_loss, interlevel_loss)

                pb_s, pb_e = out["prop_spacing"]
                fb_s, fb_e = out["fine_spacing"]
                losses["interlevel_loss"] = (
                    model_cfg.proposal_interlevel_mult * interlevel_loss(
                        out["weights"], fb_s, fb_e,
                        out["prop_weights"], pb_s, pb_e))
                if model_cfg.distortion_loss_mult > 0:
                    losses["distortion_loss"] = (
                        model_cfg.distortion_loss_mult * distortion_loss(
                            out["weights"], fb_s, fb_e))
            if model_cfg.s3im_loss_mult > 0:
                losses["s3im_loss"] = model_cfg.s3im_loss_mult * s3im_loss(
                    k_s3im, out["rgb"], target,
                    kernel_size=model_cfg.s3im_kernel_size,
                    stride=model_cfg.s3im_stride,
                    repeat_time=model_cfg.s3im_repeat_time,
                    patch_height=model_cfg.s3im_patch_height,
                )
            if (model_cfg.use_semantics and "semantics" in out
                    and "semantics" in batch):
                # class-weighted CE on rendered semantic logits
                # (nerfacto.py:676-681)
                logits = out["semantics"]
                labels = batch["semantics"]
                logp = jax.nn.log_softmax(logits, axis=-1)
                ce = -jnp.take_along_axis(
                    logp, labels[:, None], axis=-1)[:, 0]
                losses["semantics_loss"] = (
                    model_cfg.semantic_loss_weight * jnp.mean(ce))
            if params.camera_adjustment is not None:
                from gfnerf_tpu.cameras.camera_optimizers import (
                    CameraOptimizerConfig, pose_regularization)

                losses["camera_opt_regularizer"] = pose_regularization(
                    CameraOptimizerConfig(mode=field_cfg.camera_opt_mode),
                    params.camera_adjustment)
            total = sum(losses.values())
            return total, (losses, out)

        (total, (losses, out)), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(params_nb, active_table)
        grads_nb = mask_frozen_grads(grads[0], stage)
        grad_table = grads[1]
        updates, opt_state = tx.update((grads_nb, grad_table),
                                       state.opt_state,
                                       (params_nb, active_table))
        # Freezing means masking the *updates*, not just the grads: Adam's
        # first-moment carry-over turns zero grads into nonzero updates for
        # several steps after the stage switch (the reference freezes by
        # excluding the groups from the optimizer, nerfacto.py:448-489).
        updates = (mask_frozen_grads(updates[0], stage), updates[1])
        params_nb, active_table = optax.apply_updates(
            (params_nb, active_table), updates)
        if state.params.block_feats is not None:
            block_feats = state.params.block_feats.at[active_block].set(
                active_table)
        else:
            block_feats = None
        params = params_nb.replace(block_feats=block_feats)
        new_state = TrainState(params=params, opt_state=opt_state,
                               step=state.step + 1)

        if stage == STAGE_INIT:
            # occupancy stats only during init (nerfacto.py:605-614);
            # the proposal path supplies lattice-shaped probe weights
            oct_dev = update_oct_nodes(
                oct_dev, samples,
                out.get("march_weights", out["weights"]),
                out.get("march_alphas", out["alphas"]))

        err = jnp.sum(jnp.abs(out["rgb"] - target), axis=-1)  # gf_pipeline:179
        mse = jnp.mean((out["rgb"] - target) ** 2)
        metrics = {
            "loss": total,
            **losses,
            "psnr": -10.0 * jnp.log10(mse + 1e-12),
            "num_samples_per_ray": jnp.mean(samples.num_valid.astype(jnp.float32)),
        }
        if samples.num_hits is not None:
            # rays whose farthest leaf hits were dropped by the max_hits
            # top-k (VERDICT r2 weak 4: the truncation must be observable;
            # the reference marches up to 1024 intersections/ray,
            # PersSampler_cuda.cu:7-9)
            metrics["frac_truncated_rays"] = jnp.mean(
                (samples.num_hits > sampler_cfg.max_hits).astype(jnp.float32))
        return new_state, oct_dev, metrics, err

    return train_step


def make_multi_train_step(
    field_cfg: FieldConfig,
    model_cfg: GFNeRFModelConfig,
    sampler_cfg: SamplerConfig,
    tx: optax.GradientTransformation,
    stage: int,
    n_steps: int,
):
    """K train steps per dispatch via ``lax.scan``.

    Host->device dispatch through the runtime costs ~100 ms per call in this
    environment; scanning K steps inside one compiled program amortizes it.
    Semantically identical to K calls of the single step: batches are stacked
    along a leading (K, ...) axis, per-step march fineness is passed as a
    (K,) array (it is a deterministic host schedule), and the per-step error
    vectors come back stacked for the focal-stage error-map writeback.
    """
    step_fn_inner = _train_step_body(field_cfg, model_cfg, sampler_cfg, tx,
                                     stage)

    @functools.partial(jax.jit, donate_argnums=(0, 2))
    def multi_step(state, statics, oct_dev, cameras, batches, finenesses,
                   active_block, rng):
        def body(carry, xs):
            st, od, key = carry
            batch, fineness = xs
            key, sub = jax.random.split(key)
            st, od, metrics, err = step_fn_inner(
                st, statics, od, cameras, batch, fineness, active_block, sub)
            return (st, od, key), (metrics, err)
        (state, oct_dev, _), (metrics, errs) = jax.lax.scan(
            body, (state, oct_dev, rng), (batches, finenesses),
            length=n_steps)
        return state, oct_dev, metrics, errs

    return multi_step


def make_render_fn(
    field_cfg: FieldConfig,
    model_cfg: GFNeRFModelConfig,
    sampler_cfg: SamplerConfig,
):
    """Jitted eval/render for a chunk of rays (eval noise == 1,
    PersSampler_cuda.cu:381-383).

    ``stage_is_block`` is STATIC (a Python bool): the stage is always known
    at render time, and tracing it used to compute BOTH the init and the
    residual forward on every eval ray and ``where``-select — ~2x the
    field+MLP cost of the stage actually rendered.  Static selection traces
    only the live branch; the one extra compile at the init->focal
    transition is trivia next to halving every eval dispatch."""

    @functools.partial(jax.jit, static_argnums=(7,))
    def render_chunk(
        params: FieldParams,
        statics: FieldStatics,
        oct_dev: OctreeDevice,
        rays_o: jnp.ndarray,
        rays_d: jnp.ndarray,
        rel_camera_index: jnp.ndarray,  # () or (R,) appearance index
        active_block: jnp.ndarray,
        stage_is_block: bool,           # STATIC — selects the residual path
    ):
        r = rays_o.shape[0]
        noise = jnp.ones((r, sampler_cfg.max_samples))
        samples = sample_rays(oct_dev, rays_o, rays_d, noise,
                              jnp.asarray(1.0), sampler_cfg)
        deferred = sampler_cfg.march == "fast"
        rel = jnp.broadcast_to(jnp.asarray(rel_camera_index, jnp.int32), (r,))

        if stage_is_block and field_cfg.n_blocks > 0:
            ab = jnp.asarray(active_block, jnp.int32)
            # (R,)-shaped active_block = per-ray block routing (packed
            # layout, dense path): one chunk may mix every cluster's rays
            routed = (ab if ab.ndim == 1
                      and field_cfg.hash_layout == "packed"
                      and not field_cfg.use_proposal else None)
            out = model_forward(params, statics, field_cfg, model_cfg,
                                samples, rays_d, rel, STAGE_BLOCK,
                                0 if routed is not None else ab,
                                oct_dev=oct_dev,
                                warp_deferred=deferred,
                                rays_o=rays_o, routed_blocks=routed)
        else:
            out = model_forward(params, statics, field_cfg, model_cfg,
                                samples, rays_d, rel, STAGE_INIT, 0,
                                oct_dev=oct_dev, warp_deferred=deferred,
                                rays_o=rays_o)
        return {k: out[k] for k in
                ("rgb", "accumulation", "depth", "oct_depth")}

    return render_chunk
