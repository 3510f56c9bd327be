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


# ------------------------------------------------------------ multi-host ----


def initialize_multihost(coordinator_address: str, num_processes: int,
                         process_id: int):
    """Multi-host bring-up (replaces the reference's
    ``dist.init_process_group(backend="nccl", init_method=dist_url)``,
    scripts/train.py:124-137): after this, ``jax.devices()`` spans every
    host and meshes/collectives are global."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_multihost_mesh(n_block: int = 1) -> Mesh:
    """Global ("data", "block") mesh laid out for the GF-NeRF traffic
    pattern: the focal block axis is *embarrassingly parallel* (no
    cross-block reduction, see make_parallel_block_step), so it is placed
    ACROSS hosts — block traffic rides the (absent) DCN for free — while the
    data axis, whose gradient psum runs every step, stays WITHIN each
    host's ICI domain.
    """
    devices = np.asarray(jax.devices())
    n_proc = jax.process_count()
    per_host = devices.size // n_proc
    if n_block <= 1:
        return make_mesh(devices.size, 1, devices)
    # order devices host-major, then fold the block axis over hosts
    by_host = sorted(devices.reshape(-1),
                     key=lambda d: (d.process_index, d.id))
    grid = np.asarray(by_host).reshape(n_proc, per_host)
    assert (n_proc * per_host) % n_block == 0
    if n_proc % n_block == 0:
        # block spans whole hosts (ideal: zero inter-block traffic on DCN)
        devs = grid.reshape(n_block, (n_proc // n_block) * per_host).T
    else:
        devs = grid.reshape(-1)[: (devices.size // n_block) * n_block]
        devs = devs.reshape(-1, n_block)
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
        """Runs per (data, block) shard. block_feats: (blocks_per_shard, ...).

        Reuses the single-chip focal model path (``model_forward`` with a
        per-shard params/statics view whose block axis holds only the local
        active table), so packed/anchored layouts, the fused compositing
        kernel, and the Charbonnier+S3IM losses all behave identically to
        the sequential focal step.
        """
        from gfnerf_tpu.cameras.cameras import generate_rays_multi
        from gfnerf_tpu.model_components.losses import charbonnier_loss, s3im_loss
        from gfnerf_tpu.models.gfnerf import model_forward, sample_rays

        # active local table for this phase of the rotation (phase advances
        # every steps_per_split_dataset steps when n_blocks > mesh block axis)
        local = phase % blocks_per_shard
        feats = block_feats[local]

        params_view = frozen_params.replace(
            block_feats=jax.lax.stop_gradient(feats)[None])
        statics_view = FieldStatics(
            global_prim=statics_rep.global_prim,
            global_bias=statics_rep.global_bias,
            block_prims=block_prims[local][None],
            block_biases=block_biases[local][None],
        )

        rays = generate_rays_multi(cameras, batch["camera_indices"],
                                   batch["coords"])
        r = batch["coords"].shape[0]
        k_noise, k_s3im = jax.random.split(rng)
        noise = ((jax.random.uniform(k_noise, (r, sampler_cfg.max_samples))
                  - 0.5) + 1.0)
        samples = sample_rays(oct_dev, rays["origins"], rays["directions"],
                              noise, fineness, sampler_cfg)
        samples = jax.lax.stop_gradient(samples)

        def loss_fn(feats_table):
            out = model_forward(
                params_view, statics_view, field_cfg, model_cfg, samples,
                rays["directions"], batch["rel_camera_indices"],
                STAGE_BLOCK, 0, oct_dev=oct_dev,
                warp_deferred=sampler_cfg.march == "fast",
                active_table=feats_table,
            )
            loss = charbonnier_loss(out["rgb"], batch["image"])
            if model_cfg.s3im_loss_mult > 0:
                loss = loss + model_cfg.s3im_loss_mult * s3im_loss(
                    k_s3im, out["rgb"], batch["image"],
                    kernel_size=model_cfg.s3im_kernel_size,
                    stride=model_cfg.s3im_stride,
                    repeat_time=model_cfg.s3im_repeat_time,
                    patch_height=model_cfg.s3im_patch_height,
                )
            err = jnp.sum(jnp.abs(out["rgb"] - batch["image"]), axis=-1)
            return loss, err

        (loss, err), grad = jax.value_and_grad(loss_fn, has_aux=True)(feats)
        grad = jax.lax.pmean(grad, "data")
        loss = jax.lax.pmean(loss, "data")[None]  # (1,) per block group
        opt_local = jax.tree_util.tree_map(lambda x: x[local],
                                           opt_state_blocks)
        updates, opt_local = tx_block.update(grad, opt_local, feats)
        feats = optax.apply_updates(feats, updates)
        block_feats = block_feats.at[local].set(feats)
        opt_state_blocks = jax.tree_util.tree_map(
            lambda full, new: full.at[local].set(new),
            opt_state_blocks, opt_local)
        return block_feats, opt_state_blocks, loss, err

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
        out_specs=(pspec_block, pspec_block, P("block"),
                   P(("block", "data"))),
        check_vma=False,
    )
    return jax.jit(sharded)
