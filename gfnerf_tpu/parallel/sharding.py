"""Multi-chip sharding: mesh construction + sharded train steps.

Replaces the reference's distributed layer (``scripts/train.py:90-214``
mp.spawn + NCCL DDP, ``nerfstudio/utils/comms.py``) with a
``jax.sharding.Mesh`` + GSPMD design (SURVEY.md §2.4):

- **data axis**: rays sharded across chips; gradient psum is inserted by XLA
  over ICI (the DDP allreduce equivalent).
- **block axis**: the focal residual tables live sharded across chips
  (removing the reference's disk paging, nerfacto_field.py:248-404) — and
  because the focal stage freezes every shared parameter
  (nerfacto_field.py:459-461), block training is *embarrassingly parallel*:
  each block-axis group trains its own residual table on rays from its own
  camera cluster concurrently.  The reference's 10 sequential 10k-step
  phases become one 10k-step phase on a 10-group mesh — a speedup the
  GPU+paging design cannot express.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gfnerf_tpu.fields.field import (
    FieldConfig,
    FieldParams,
    FieldStatics,
    STAGE_BLOCK,
    STAGE_INIT,
)
from gfnerf_tpu.models.gfnerf import GFNeRFModelConfig, TrainState, model_forward
from gfnerf_tpu.sampler.perssampler import (
    OctreeDevice,
    SamplerConfig,
    get_samples,
    update_oct_nodes,
)


def make_mesh(n_data: int, n_block: int = 1,
              devices: Optional[np.ndarray] = None) -> Mesh:
    """Mesh with ("data", "block") axes over the local devices."""
    if devices is None:
        devices = np.asarray(jax.devices())
    assert devices.size >= n_data * n_block, (
        f"need {n_data * n_block} devices, have {devices.size}")
    devs = devices.reshape(-1)[: n_data * n_block].reshape(n_data, n_block)
    return Mesh(devs, axis_names=("data", "block"))


def param_shardings(mesh: Mesh, params: FieldParams) -> FieldParams:
    """NamedShardings: block tables sharded over "block", rest replicated."""
    rep = NamedSharding(mesh, P())
    blk = NamedSharding(mesh, P("block"))

    def rep_tree(tree):
        return jax.tree_util.tree_map(lambda _: rep, tree)

    return FieldParams(
        global_feat=rep,
        block_feats=None if params.block_feats is None else blk,
        base_net=rep_tree(params.base_net),
        mlp_head=rep_tree(params.mlp_head),
        appearance_embedding=rep,
        mlp_semantics=(None if params.mlp_semantics is None
                       else rep_tree(params.mlp_semantics)),
        semantics_head=(None if params.semantics_head is None
                        else rep_tree(params.semantics_head)),
    )


def statics_shardings(mesh: Mesh, statics: FieldStatics) -> FieldStatics:
    rep = NamedSharding(mesh, P())
    blk = NamedSharding(mesh, P("block"))
    return FieldStatics(
        global_prim=rep, global_bias=rep,
        block_prims=None if statics.block_prims is None else blk,
        block_biases=None if statics.block_biases is None else blk,
    )


def shard_params(mesh: Mesh, params: FieldParams,
                 statics: FieldStatics):
    """device_put params/statics with the mesh shardings."""
    p_sh = param_shardings(mesh, params)
    s_sh = statics_shardings(mesh, statics)
    params = jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), params, p_sh)
    statics = jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), statics, s_sh)
    return params, statics


def batch_sharding(mesh: Mesh):
    """Rays sharded over the data axis (replicated over block)."""
    return NamedSharding(mesh, P("data"))


# ------------------------------------------------- DP init-stage step ----


def make_dp_train_step(
    field_cfg: FieldConfig,
    model_cfg: GFNeRFModelConfig,
    sampler_cfg: SamplerConfig,
    tx: optax.GradientTransformation,
    mesh: Mesh,
):
    """Init-stage train step, rays data-parallel across the mesh.

    Identical math to models.gfnerf.make_train_step(STAGE_INIT); the batch
    arrives sharded over "data" and XLA inserts the gradient psum over ICI.
    """
    from gfnerf_tpu.models.gfnerf import make_train_step

    inner = make_train_step(field_cfg, model_cfg, sampler_cfg, tx, STAGE_INIT)

    b_sh = batch_sharding(mesh)

    def step(state, statics, oct_dev, cameras, batch, fineness,
             active_block, rng):
        batch = {k: jax.device_put(v, b_sh) for k, v in batch.items()}
        return inner(state, statics, oct_dev, cameras, batch, fineness,
                     active_block, rng)

    return step


# ------------------------------------- parallel-block focal-stage step ----


def make_parallel_block_step(
    field_cfg: FieldConfig,
    model_cfg: GFNeRFModelConfig,
    sampler_cfg: SamplerConfig,
    tx_block: optax.GradientTransformation,
    mesh: Mesh,
):
    """Focal-stage step training every block-axis group's table concurrently.

    Batch leaves have leading dim (n_block_groups * R): group g's slice holds
    rays sampled from camera cluster g.  Each group computes grads only for
    its own residual table; shared params are frozen (reference
    nerfacto_field.py:459-461), so no cross-group reduction is needed —
    jax.shard_map with per-shard block index.
    """
    n_block = mesh.shape["block"]
    n_blocks = field_cfg.n_blocks
    assert n_blocks % n_block == 0
    blocks_per_shard = n_blocks // n_block

    def shard_fn(block_feats, block_prims, block_biases, opt_state_blocks,
                 frozen_params, statics_rep, oct_dev, cameras, batch,
                 fineness, phase, rng):
        """Runs per (data, block) shard. block_feats: (blocks_per_shard, ...)."""
        # active local table for this phase of the rotation (phase advances
        # every steps_per_split_dataset steps when n_blocks > mesh block axis)
        local = phase % blocks_per_shard
        feats = block_feats[local]
        prims = block_prims[local]
        biases = block_biases[local]

        from gfnerf_tpu.cameras.cameras import generate_rays_multi
        from gfnerf_tpu.cameras.rays import get_weights_f2nerf
        from gfnerf_tpu.fields.activations import trunc_exp
        from gfnerf_tpu.fields.hash_encoding import hash_encode_raw, hash_encode_sorted
        from gfnerf_tpu.fields.mlp import apply_mlp
        from gfnerf_tpu.fields.sh_encoding import sh_encode_deg4
        from gfnerf_tpu.model_components.losses import charbonnier_loss
        from gfnerf_tpu.model_components.renderers import render_rgb

        rays = generate_rays_multi(cameras, batch["camera_indices"],
                                   batch["coords"])
        r = batch["coords"].shape[0]
        noise = ((jax.random.uniform(rng, (r, sampler_cfg.max_samples))
                  - 0.5) + 1.0)
        from gfnerf_tpu.models.gfnerf import sample_rays
        from gfnerf_tpu.sampler.perssampler import warp_points

        samples = sample_rays(oct_dev, rays["origins"], rays["directions"],
                              noise, fineness, sampler_cfg)
        anc = samples.trans_idx.reshape(-1)
        if sampler_cfg.march == "fast":
            n_trans = oct_dev.w2xz.shape[0]
            warp = warp_points(oct_dev, jnp.clip(anc, 0, n_trans - 1),
                               samples.world_pts.reshape(-1, 3))
        else:
            warp = samples.warp_pts.reshape(-1, 3)
        pts = (warp + 1.5) / 3.0
        base_feats = jax.lax.stop_gradient(hash_encode_raw(
            frozen_params.global_feat, statics_rep.global_prim,
            statics_rep.global_bias, pts, anc))

        def loss_fn(feats_table):
            h_feats = base_feats + hash_encode_sorted(
                feats_table, prims, biases, pts, anc)
            h = apply_mlp(frozen_params.base_net, h_feats)
            density = trunc_exp(h[..., 0] + 1.0) * (anc >= 0)
            density = density.reshape(samples.trans_idx.shape)
            geo = h[..., 1:]
            dirs = jnp.broadcast_to(rays["directions"][:, None, :],
                                    samples.world_pts.shape).reshape(-1, 3)
            d_enc = sh_encode_deg4(dirs)
            rel = jnp.broadcast_to(batch["rel_camera_indices"][:, None],
                                   samples.trans_idx.shape).reshape(-1)
            emb = frozen_params.appearance_embedding[rel]
            hh = jnp.concatenate([d_enc, geo, emb], axis=-1)
            rgb_s = apply_mlp(frozen_params.mlp_head, hh,
                              output_activation="sigmoid")
            rgb_s = rgb_s.reshape(*samples.trans_idx.shape, 3)
            w, _, _ = get_weights_f2nerf(samples.dists, density)
            rgb = render_rgb(w, rgb_s, model_cfg.background_color)
            # mean over the data axis within this block group
            loss = charbonnier_loss(rgb, batch["image"])
            return loss

        loss, grad = jax.value_and_grad(loss_fn)(feats)
        grad = jax.lax.pmean(grad, "data")
        loss = jax.lax.pmean(loss, "data")
        opt_local = jax.tree_util.tree_map(lambda x: x[local],
                                           opt_state_blocks)
        updates, opt_local = tx_block.update(grad, opt_local, feats)
        feats = optax.apply_updates(feats, updates)
        block_feats = block_feats.at[local].set(feats)
        opt_state_blocks = jax.tree_util.tree_map(
            lambda full, new: full.at[local].set(new),
            opt_state_blocks, opt_local)
        return block_feats, opt_state_blocks, loss

    pspec_block = P("block")
    pspec_batch = P("data")
    pspec_rep = P()

    sharded = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(pspec_block, pspec_block, pspec_block, pspec_block,
                  pspec_rep, pspec_rep, pspec_rep, pspec_rep,
                  {k: P(("block", "data")) for k in
                   ("camera_indices", "rel_camera_indices", "coords",
                    "image")},
                  pspec_rep, pspec_rep, pspec_rep),
        out_specs=(pspec_block, pspec_block, pspec_rep),
        check_vma=False,
    )
    return jax.jit(sharded)
