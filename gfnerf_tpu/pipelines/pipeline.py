"""GF-NeRF pipeline: datamanager + sampler + model + optimizer state.

Equivalent of ``GFNerfPipeline`` (``gfnerf/gf_pipeline.py:77-299``) plus the
model-side training callbacks (``gfnerf/nerfacto.py:323-520``), expressed as
explicit host-side stage logic around fully-jitted device steps:

- ``get_train_loss_dict``: assemble the host batch, run the stage's compiled
  train step, write live errors back into the focal error maps
  (gf_pipeline.py:179-186), and run milestone octree rebuilds,
- stage transition (init -> block, SURVEY.md §3.2): render per-view error
  maps at 1/8 res (nerfacto.py:361-427), spectral-cluster the cameras
  (nerfacto.py:354-359), assign octree blocks, switch the datamanager to the
  per-cluster split dataset (base_datamanager.py:783-861),
- eval: chunked full-image render with nearest-camera block/appearance
  lookup (perssampler.py:369-376, nerfacto_field.py:526-533).
"""

from __future__ import annotations

import dataclasses
import os
import sys
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gfnerf_tpu.cameras.cameras import get_image_coords
from gfnerf_tpu.data.datamanager import GFNerfDataManager, GFNerfDataManagerConfig
from gfnerf_tpu.engine.optimizers import (OptimizersConfig, build_optimizer,
                                          optimizer_arg)
from gfnerf_tpu.fields.field import (
    STAGE_BLOCK,
    STAGE_INIT,
    FieldConfig,
    init_field_params,
)
from gfnerf_tpu.models.gfnerf import (
    GFNeRFModelConfig,
    TrainState,
    make_render_fn,
    make_train_step,
)
from gfnerf_tpu.sampler.manager import PersSamplerManager, PersSamplerManagerConfig
from gfnerf_tpu.utils import profiler


@dataclasses.dataclass
class GFNerfPipelineConfig:
    datamanager: GFNerfDataManagerConfig = dataclasses.field(
        default_factory=GFNerfDataManagerConfig)
    model: GFNeRFModelConfig = dataclasses.field(
        default_factory=GFNeRFModelConfig)
    sampler: PersSamplerManagerConfig = dataclasses.field(
        default_factory=PersSamplerManagerConfig)
    optimizers: OptimizersConfig = dataclasses.field(
        default_factory=OptimizersConfig)
    field_log2_hashmap_size: int = 21
    field_num_levels: int = 16
    field_features_per_level: int = 2
    field_hash_layout: str = "anchored"   # "anchored" | "packed" (fields/packed_hash.py)
    field_packed_rows_log2: int = 15
    field_block_rows_log2: int | None = None  # residual-table rows when != global
    field_block_dense_levels: int = 0
    field_focal_mode: str = "residual"    # "residual" | "finetune" (field.py)
    """First k residual levels use collision-free linear addressing where
    the grid fits (QUALITY.md finding-7 fix (b); FieldConfig doc)."""
    field_mlp_dtype: str = "float32"      # "bfloat16" = tcnn-fp16-class compute
    field_use_proposal: bool = False      # proposal probe (fields/field.py)
    field_warp_mode: str = "pers"         # "identity" = world-space ablation
    field_density_bias: float = 1.0
    field_proposal_levels: int = 4
    field_proposal_rows_log2: int = 12
    field_hidden_dim: int = 128
    field_hidden_dim_color: int = 128
    use_appearance_embedding: bool = True
    camera_opt_mode: str = "off"   # "off" | "SO3xR3" | "SE3"
    use_error_sampling: bool = True
    """False: focal splits sample pixels uniformly instead of 20%
    error-map-weighted (diagnostic ablation, QUALITY.md finding 4; error
    maps are still rendered for observability)."""
    eval_num_rays_per_chunk: int = 2048
    eval_early_term: bool = False
    """Full-image renders (render_camera: eval images, error maps, viewer)
    use the two-phase transmittance early-termination path
    (models/render_early.py): saturated rays skip their tail samples.
    Results match the single pass to within eval_early_term_eps. Ignored
    for proposal configs and non-black backgrounds (unsupported there)."""
    eval_early_term_eps: float = 5e-3
    camera_bounds: tuple = (0.01, 512.0)   # gf_pipeline.py:117-120
    seed: int = 42
    parallel_blocks: bool = False
    """Train the focal residual tables concurrently across a ("data",
    "block") device mesh (parallel/sharding.py:make_parallel_block_step)
    instead of the reference's one-block-at-a-time sequence.  Requires
    >= 2 devices; the block axis takes min(n_blocks, largest divisor of the
    device count that divides n_blocks)."""
    parallel_block_axis: int = 0
    """Block-axis size for parallel_blocks; 0 = auto."""
    steps_per_dispatch: int = 1
    """K > 1: train K steps per device dispatch via make_multi_train_step's
    lax.scan (bench.py's fast path, available in production training; host
    dispatch costs ~100 ms through the TPU relay and K amortizes it).
    Error-map writeback stays lossless — all K per-step error vectors are
    written after each dispatch (at most K-1 steps of staleness vs the
    reference's per-step cadence, gf_pipeline.py:179-186; VERDICT r3 weak
    7).  Windows never cross a stage/split/milestone/compaction boundary —
    those steps fall back to the single-step path, so rebuild semantics are
    unchanged.  Keep eval/checkpoint intervals multiples of K: inside a
    window the trainer sees buffered per-step metrics, and state already
    sits at the window end."""

    def build(self, dataparser, base_dir, test_mode="train"):
        return GFNerfPipeline(self, dataparser, base_dir, test_mode)


class GFNerfPipeline:
    def __init__(self, config: GFNerfPipelineConfig, dataparser,
                 base_dir: Path, test_mode: str = "train"):
        self.config = config
        self.base_dir = Path(base_dir)
        mcfg = config.model

        self.datamanager = GFNerfDataManager(config.datamanager, dataparser,
                                             seed=config.seed)
        cams = self.datamanager.train_dataparser_outputs.cameras
        n_cameras = len(cams)
        bounds = np.tile(np.asarray(config.camera_bounds, np.float32),
                         (n_cameras, 1))

        # sampler (octree built from the train cameras)
        self.sampler = PersSamplerManager(
            c2w=cams.camera_to_worlds,
            intri=cams.intrinsics_matrices(),
            bounds=bounds,
            config=config.sampler,
            n_split_dataset=mcfg.n_split_dataset,
            steps_per_split_dataset=mcfg.steps_per_split_dataset,
            steps_perssampler_init=mcfg.steps_perssampler_init,
        )

        # block centers = every (n_cams/n_blocks)-th camera (nerfacto.py:232-241)
        step_n = max(n_cameras // mcfg.n_blocks, 1)
        self.block_centers = np.stack([
            cams.camera_to_worlds[min(i * step_n, n_cameras - 1), :, 3]
            for i in range(mcfg.n_blocks)
        ])

        self.field_cfg = FieldConfig(
            num_images=n_cameras,
            hidden_dim=config.field_hidden_dim,
            hidden_dim_color=config.field_hidden_dim_color,
            log2_hashmap_size=config.field_log2_hashmap_size,
            num_levels=config.field_num_levels,
            features_per_level=config.field_features_per_level,
            n_blocks=mcfg.n_blocks,
            n_volumes=self.sampler.n_volumes,
            use_appearance_embedding=config.use_appearance_embedding,
            use_semantics=mcfg.use_semantics,
            camera_opt_mode=config.camera_opt_mode,
            hash_layout=config.field_hash_layout,
            packed_rows_log2=config.field_packed_rows_log2,
            block_rows_log2=config.field_block_rows_log2,
            block_dense_levels=config.field_block_dense_levels,
            focal_mode=config.field_focal_mode,
            mlp_dtype=config.field_mlp_dtype,
            use_proposal=config.field_use_proposal,
            warp_mode=config.field_warp_mode,
            density_bias=config.field_density_bias,
            proposal_levels=config.field_proposal_levels,
            proposal_rows_log2=config.field_proposal_rows_log2,
        )
        params, self.statics = init_field_params(self.field_cfg,
                                                 seed=config.seed)
        self.tx = build_optimizer(
            dataclasses.replace(
                config.optimizers,
                steps_perssampler_init=mcfg.steps_perssampler_init,
                steps_per_split_dataset=mcfg.steps_per_split_dataset,
                n_split_dataset=mcfg.n_split_dataset,
            ),
            params,
        )
        self.state = TrainState(
            params=params,
            opt_state=self.tx.init(optimizer_arg(params)),
            step=jnp.asarray(0, jnp.int32),
        )
        self._last_split_idx = -1

        self.cameras_dev = cams.to_device()
        self._build_step_fns()
        self._rng = jax.random.PRNGKey(config.seed)
        self.sample_tmp_dir: Optional[str] = None
        # K-step dispatch: buffered per-step metrics for steps already
        # computed inside a scanned window, and the trainer's step budget
        # (set by Trainer so windows never run past the final iteration).
        self._pending_metrics: Dict[int, Dict[str, float]] = {}
        self._multi_step_fns: dict = {}
        self.total_train_steps: Optional[int] = None
        # K-dispatch coverage accounting (VERDICT r4 weak 7): how many steps
        # actually ran inside a scanned window vs the single-step fallback
        # around milestone/split/compaction boundaries.
        self._k_steps_scanned = 0
        self._k_steps_fallback = 0

        # data-parallel mesh across all local devices (replaces the
        # reference's NCCL DDP, SURVEY.md §2.4): batches are sharded over
        # the "data" axis and XLA inserts the gradient psum over ICI.
        # With parallel_blocks, the mesh gains a "block" axis: focal
        # residual tables live sharded across it and train concurrently
        # (parallel/sharding.py) — the reference's 10 sequential focal
        # phases collapse to n_blocks/block_axis phases.
        n_dev = len(jax.devices())
        self._parallel = False
        if n_dev > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from gfnerf_tpu.parallel.sharding import make_mesh

            n_block_axis = 1
            if config.parallel_blocks and mcfg.n_blocks > 1:
                n_block_axis = config.parallel_block_axis
                if n_block_axis <= 0:
                    n_block_axis = max(
                        b for b in range(1, min(n_dev, mcfg.n_blocks) + 1)
                        if n_dev % b == 0 and mcfg.n_blocks % b == 0)
                assert n_dev % n_block_axis == 0
                assert mcfg.n_blocks % n_block_axis == 0
                self._parallel = n_block_axis > 1
            self.mesh = make_mesh(n_dev // n_block_axis, n_block_axis)
            self.n_block_axis = n_block_axis
            # init-stage batches shard over every chip (both axes)
            self._batch_sharding = NamedSharding(self.mesh,
                                                 P(("data", "block")))
            if self._parallel:
                from gfnerf_tpu.parallel.sharding import shard_params

                params2, self.statics = shard_params(self.mesh,
                                                     self.state.params,
                                                     self.statics)
                self.state = self.state.replace(params=params2)
                rep = NamedSharding(self.mesh, P())
                put = lambda t: jax.tree_util.tree_map(
                    lambda x: jax.device_put(x, rep), t)
                self.state = self.state.replace(
                    opt_state=put(self.state.opt_state),
                    step=jax.device_put(self.state.step, rep))
                import optax

                from gfnerf_tpu.parallel.sharding import (
                    make_parallel_block_step)

                self._tx_block = optax.chain(
                    optax.scale_by_adam(eps=1e-15),
                    optax.scale(-5e-3),  # reference block lr (nerfacto.py:471)
                )
                self._pb_step = make_parallel_block_step(
                    self.field_cfg, mcfg, self.sampler.sampler_config,
                    self._tx_block, self.mesh)
                self._opt_blocks = None
                self._pb_batch_sharding = NamedSharding(
                    self.mesh, P(("block", "data")))
            else:
                rep = NamedSharding(self.mesh, P())
                put = lambda t: jax.tree_util.tree_map(
                    lambda x: jax.device_put(x, rep), t)
                self.state = put(self.state)
                self.statics = put(self.statics)
            rep = NamedSharding(self.mesh, P())
            put = lambda t: jax.tree_util.tree_map(
                lambda x: jax.device_put(x, rep), t)
            self.sampler.oct_dev = put(self.sampler.oct_dev)
            self.cameras_dev = put(self.cameras_dev)
        else:
            self.mesh = None
            self.n_block_axis = 1
            self._batch_sharding = None

    def _build_step_fns(self):
        """(Re)build the jitted train/render steps from the manager's
        current sampler config (max_hits can grow after milestone rebuilds
        — a static shape, so growth costs one retrace)."""
        mcfg = self.config.model
        scfg = self.sampler.sampler_config
        self._built_sampler_cfg = scfg
        self._multi_step_fns = {}
        self._train_step = {
            STAGE_INIT: make_train_step(self.field_cfg, mcfg, scfg, self.tx,
                                        STAGE_INIT),
            STAGE_BLOCK: make_train_step(self.field_cfg, mcfg, scfg, self.tx,
                                         STAGE_BLOCK),
        }
        self._render_chunk = make_render_fn(self.field_cfg, mcfg, scfg)
        self._build_early_renderer()
        if getattr(self, "_parallel", False):
            from gfnerf_tpu.parallel.sharding import make_parallel_block_step

            self._pb_step = make_parallel_block_step(
                self.field_cfg, mcfg, scfg, self._tx_block, self.mesh)

    def _build_early_renderer(self):
        mcfg = self.config.model
        self._early_renderer = None
        if (self.config.eval_early_term
                and mcfg.num_proposal_resamples == 0
                and mcfg.background_color == "black"):
            from gfnerf_tpu.models.render_early import EarlyTermRenderer

            self._early_renderer = EarlyTermRenderer(
                self.field_cfg, mcfg, self._built_sampler_cfg,
                eps=self.config.eval_early_term_eps)

    def enable_early_term(self, eps: Optional[float] = None) -> bool:
        """Turn on two-phase early-termination full-image rendering after
        construction (scripts/render.py --early-term). Returns True when the
        renderer is active; False (with a stderr note) for configs where it
        is unsupported (proposal resampling, non-black background)."""
        self.config.eval_early_term = True
        if eps is not None:
            self.config.eval_early_term_eps = eps
        self._build_early_renderer()
        if self._early_renderer is None:
            print("[pipeline] early-term rendering unsupported for this "
                  "config (proposal resampling or non-black background); "
                  "keeping the single-pass renderer", file=sys.stderr)
            return False
        return True

    # --------------------------------------------------------------- train ----

    def stage_of(self, step: int) -> int:
        mcfg = self.config.model
        init = (mcfg.steps_perssampler_init > 0
                and step < mcfg.steps_perssampler_init)
        return STAGE_INIT if init else STAGE_BLOCK

    # ------------------------------------------- parallel focal helpers ----

    def parallel_phase(self, step: int) -> int:
        """Rotation phase: with B = n_blocks/block_axis, phase p trains
        blocks {g*B + p : g in block groups} concurrently."""
        mcfg = self.config.model
        bps = mcfg.n_blocks // self.n_block_axis
        rel = max(step - mcfg.steps_perssampler_init, 0)
        return (rel // mcfg.steps_per_split_dataset) % bps

    def parallel_active_blocks(self, step: int) -> list:
        bps = self.config.model.n_blocks // self.n_block_axis
        p = self.parallel_phase(step)
        return [g * bps + p for g in range(self.n_block_axis)]

    def _train_parallel_block(self, step: int) -> Dict[str, float]:
        """One concurrent-blocks focal step (parallel/sharding.py)."""
        import jax

        blocks = self.parallel_active_blocks(step)
        batches = self.datamanager.next_train_parallel(step, blocks)
        caches = [b.pop("_cache") for b in batches]
        for b in batches:
            b.pop("_outputs")
        dev_batch = {
            k: jax.device_put(
                jnp.asarray(np.concatenate(
                    [np.asarray(b[key_src]) for b in batches], axis=0)),
                self._pb_batch_sharding)
            for k, key_src in (("camera_indices", "rel_camera_indices"),
                               ("rel_camera_indices", "rel_camera_indices"),
                               ("coords", "coords"), ("image", "image"))
        }
        fineness = jnp.asarray(self.sampler.fineness(step), jnp.float32)
        phase = jnp.asarray(self.parallel_phase(step), jnp.int32)
        self._rng, key = jax.random.split(self._rng)
        if self._opt_blocks is None:
            self._opt_blocks = jax.vmap(self._tx_block.init)(
                self.state.params.block_feats)
        block_feats, self._opt_blocks, losses, errs = self._pb_step(
            self.state.params.block_feats, self.statics.block_prims,
            self.statics.block_biases, self._opt_blocks,
            self.state.params.replace(block_feats=None), self.statics,
            self.sampler.oct_dev, self.cameras_dev, dev_batch, fineness,
            phase, key)
        self.state = self.state.replace(
            params=self.state.params.replace(block_feats=block_feats),
            step=self.state.step + 1)
        errs_np = np.asarray(errs)
        r = errs_np.shape[0] // len(blocks)
        for i, (b, cache) in enumerate(zip(batches, caches)):
            if cache.error_maps is not None:
                ns = int(b.get("n_split_rays", r))
                cache.update_error_map(b["indices"][:ns],
                                       errs_np[i * r:(i + 1) * r][:ns])
        losses_np = np.asarray(losses)
        return {"loss": float(losses_np.mean()),
                **{f"block_{blk}_loss": float(l)
                   for blk, l in zip(blocks, losses_np)}}

    # ------------------------------------------------- K-step dispatch ----

    def _k_window_ok(self, step: int, K: int) -> bool:
        """A [step, step+K) scan window is eligible iff no host-side event
        (stage transition, split switch, milestone subdivision, periodic
        compaction, end of training) falls inside it."""
        mcfg = self.config.model
        if (self.total_train_steps is not None
                and step + K > self.total_train_steps):
            return False
        if len({self.stage_of(step + i) for i in range(K)}) > 1:
            return False
        if self.stage_of(step) == STAGE_BLOCK:
            if self._parallel and self.sampler.cameras_labels is not None:
                return False  # parallel-blocks path has its own dispatch
            if len({self.sampler.cur_split_idx(step + i)
                    for i in range(K)}) > 1:
                return False
        else:
            ms = self.sampler.milestones
            if ms and ms[0] <= step + K - 1:
                return False
            cf = self.sampler.cfg.compact_freq
            if any((step + i) > 0 and (step + i) % cf == 0
                   for i in range(K)):
                return False
        return True

    def _train_k_steps(self, step: int, K: int) -> Dict[str, float]:
        """One lax.scan dispatch covering steps [step, step+K): stacked
        batches in, per-step metrics + error vectors out; all K error
        vectors land in the focal error maps right after the dispatch."""
        stage = self.stage_of(step)
        fn = self._multi_step_fns.get((stage, K))
        if fn is None:
            from gfnerf_tpu.models.gfnerf import make_multi_train_step

            fn = make_multi_train_step(
                self.field_cfg, self.config.model,
                self.sampler.sampler_config, self.tx, stage, K)
            self._multi_step_fns[(stage, K)] = fn

        batches = [self.datamanager.next_train(step + i) for i in range(K)]
        caches = [b.pop("_cache") for b in batches]
        for b in batches:
            b.pop("_outputs")
        keys = ["coords", "image"]
        if all("semantics" in b for b in batches):
            keys.append("semantics")
        stacked = {
            "camera_indices": jnp.stack(
                [jnp.asarray(b["rel_camera_indices"]) for b in batches]),
            "rel_camera_indices": jnp.stack(
                [jnp.asarray(b["rel_camera_indices"]) for b in batches]),
            **{k: jnp.stack([jnp.asarray(b[k]) for b in batches])
               for k in keys},
        }
        if self._batch_sharding is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            sh = NamedSharding(self.mesh, P(None, ("data", "block")))
            stacked = {k: jax.device_put(v, sh) for k, v in stacked.items()}
        finenesses = jnp.asarray(
            [self.sampler.fineness(step + i) for i in range(K)], jnp.float32)
        active_block = jnp.asarray(
            max(self.sampler.cur_split_idx(step), 0), jnp.int32)
        self._rng, key = jax.random.split(self._rng)

        self.state, self.sampler.oct_dev, metrics, errs = fn(
            self.state, self.statics, self.sampler.oct_dev, self.cameras_dev,
            stacked, finenesses, active_block, key)

        if stage == STAGE_BLOCK:
            errs_np = np.asarray(errs)
            for i, (b, cache) in enumerate(zip(batches, caches)):
                if cache.error_maps is not None:
                    ns = int(b.get("n_split_rays", len(b["indices"])))
                    cache.update_error_map(b["indices"][:ns],
                                           errs_np[i][:ns])
        metrics_np = {k: np.asarray(v) for k, v in metrics.items()}
        for i in range(1, K):
            self._pending_metrics[step + i] = {
                k: float(v[i]) for k, v in metrics_np.items()}
        return {k: float(v[0]) for k, v in metrics_np.items()}

    @profiler.time_function
    def get_train_loss_dict(self, step: int) -> Dict[str, float]:
        if step in self._pending_metrics:
            return self._pending_metrics.pop(step)
        stage = self.stage_of(step)
        K = self.config.steps_per_dispatch
        if K > 1 and self._k_window_ok(step, K):
            self._k_steps_scanned += K
            return self._train_k_steps(step, K)
        if K > 1:
            self._k_steps_fallback += 1
        if (stage == STAGE_BLOCK and self._parallel
                and self.sampler.cameras_labels is not None):
            return self._train_parallel_block(step)
        batch = self.datamanager.next_train(step)
        cache = batch.pop("_cache")
        batch.pop("_outputs")
        dev_batch = {
            "camera_indices": jnp.asarray(batch["rel_camera_indices"]),
            "rel_camera_indices": jnp.asarray(batch["rel_camera_indices"]),
            "coords": jnp.asarray(batch["coords"]),
            "image": jnp.asarray(batch["image"]),
        }
        if "semantics" in batch:
            dev_batch["semantics"] = jnp.asarray(batch["semantics"])
        if self._batch_sharding is not None:
            dev_batch = {k: jax.device_put(v, self._batch_sharding)
                         for k, v in dev_batch.items()}
        fineness = jnp.asarray(self.sampler.fineness(step), jnp.float32)
        active_block = jnp.asarray(max(self.sampler.cur_split_idx(step), 0),
                                   jnp.int32)
        self._rng, key = jax.random.split(self._rng)

        self.state, self.sampler.oct_dev, metrics, err = self._train_step[stage](
            self.state, self.statics, self.sampler.oct_dev, self.cameras_dev,
            dev_batch, fineness, active_block, key,
        )

        # focal stage: live error-map update (gf_pipeline.py:179-186);
        # mixed full-scene rays (focal_uniform_fraction) sit at the end of
        # the batch and index a different cache — exclude them.
        if stage == STAGE_BLOCK and cache.error_maps is not None:
            ns = int(batch.get("n_split_rays", len(batch["indices"])))
            cache.update_error_map(batch["indices"][:ns],
                                   np.asarray(err)[:ns])

        # init stage: milestone subdivision / compaction on host
        if stage == STAGE_INIT:
            if (self.sampler.maybe_rebuild(step)
                    and self.sampler.sampler_config
                    is not self._built_sampler_cfg):
                self._build_step_fns()

        return {k: float(v) for k, v in metrics.items()}

    def after_train_iteration(self, step: int):
        """Stage-transition callbacks, in reference registration order
        (nerfacto.py:516-519): error maps -> clustering -> datamanager."""
        mcfg = self.config.model
        if (self.stage_of(step) == STAGE_BLOCK
                and self.sampler.cameras_labels is None):
            self.render_init_error_maps(step)
            self.sampler.train_cameras_clustering(mcfg.n_blocks)
            self.sampler.update_block_idxs(self.block_centers)
            if (self.field_cfg.focal_mode == "finetune"
                    and self.state.params.block_feats is not None):
                # finetune focal mode: seed every block table with the
                # trained global table exactly once at the transition
                # (labels persist through checkpoints, so a resume never
                # re-copies).  Routed eval == shared eval at this instant.
                g = self.state.params.global_feat
                self.state = self.state.replace(params=self.state.params.replace(
                    block_feats=jnp.broadcast_to(
                        g[None], self.state.params.block_feats.shape)))
        if self.stage_of(step) == STAGE_BLOCK and self._parallel:
            phase = self.parallel_phase(step)
            if phase != self._last_split_idx:
                # fresh per-block optimizer states at each phase rotation
                # (the sequential path's optimizer swap, nerfacto.py:448-489)
                self._opt_blocks = None
                self._last_split_idx = phase
            self.datamanager.setup_train_splits_parallel(
                self.sampler.cameras_labels,
                self.parallel_active_blocks(step),
                self.sample_tmp_dir if self.config.use_error_sampling
                else None,
                self.config.datamanager.train_num_rays_per_batch)
            return
        if self.stage_of(step) == STAGE_BLOCK:
            cur = self.sampler.cur_split_idx(step)
            if cur != self._last_split_idx:
                # fresh block optimizer at each split activation, matching
                # the reference's add_optimizer/delete_optimizer swap
                # (nerfacto.py:448-489); fields/global are frozen from here
                # on, so re-initializing the whole optax state is exact.
                self.state = self.state.replace(
                    opt_state=self.tx.init(optimizer_arg(self.state.params)))
                self._last_split_idx = cur
            self.datamanager.setup_train_split_oct(
                self.sampler.cameras_labels, cur,
                self.sample_tmp_dir if self.config.use_error_sampling
                else None,
            )

    def get_eval_loss_dict(self, step: int) -> Dict[str, float]:
        """Eval-ray-batch metrics (VanillaPipeline.get_eval_loss_dict
        equivalent; logged every steps_per_eval_batch)."""
        from gfnerf_tpu.cameras.cameras import generate_rays_multi
        from gfnerf_tpu.fields.field import STAGE_BLOCK

        batch = self.datamanager.next_eval(step)
        outputs = batch.pop("_outputs")
        cams_dev = outputs.cameras.to_device()
        rays = generate_rays_multi(cams_dev,
                                   jnp.asarray(batch["camera_indices"]),
                                   jnp.asarray(batch["coords"]))
        stage = self.stage_of(step)
        # Nearest-camera appearance/block lookup must be *per camera*: the
        # eval ray batch mixes cameras from all clusters, so a single
        # batch-wide nearest index would mislabel most rays.  Group rays by
        # their camera's (split, nearest) pair and render each group with
        # its own block.
        cam_idx_np = np.asarray(batch["camera_indices"])
        o = np.asarray(rays["origins"]); d = np.asarray(rays["directions"])
        r = rays["origins"].shape[0]
        chunk = self.config.eval_num_rays_per_chunk
        pred = np.zeros((r, 3), np.float32)
        split_ray = np.zeros(r, np.int32)
        nearest_ray = np.zeros(r, np.int32)
        for cam in np.unique(cam_idx_np):
            sel = np.nonzero(cam_idx_np == cam)[0]
            split_idx, nearest = self.sampler.get_nearest_split_dataset(
                o[sel[0]])
            split_ray[sel] = max(split_idx, 0)
            nearest_ray[sel] = nearest
        routed = (self.field_cfg.hash_layout == "packed"
                  and not self.field_cfg.use_proposal
                  and self.field_cfg.n_blocks > 0)
        if routed:
            # per-ray block routing: ONE chunked stream over the whole
            # batch (r3 weak 6: per-(split, nearest) groups padded each
            # tail chunk — with many small camera groups most of the
            # compute was padding)
            groups = [(None, [np.arange(r)])]
        else:
            gmap: Dict[tuple, list] = {}
            for cam in np.unique(cam_idx_np):
                sel = np.nonzero(cam_idx_np == cam)[0]
                key = (int(split_ray[sel[0]]), int(nearest_ray[sel[0]]))
                gmap.setdefault(key, []).append(sel)
            groups = list(gmap.items())
        for gkey, sels in groups:
            sel = np.concatenate(sels)
            for start in range(0, len(sel), chunk):
                ids = sel[start: start + chunk]
                pad = chunk - len(ids)
                pidx = np.concatenate([ids, np.repeat(ids[-1:], pad)])
                ro = jnp.asarray(o[pidx]); rd = jnp.asarray(d[pidx])
                if routed:
                    rel = jnp.asarray(nearest_ray[pidx], jnp.int32)
                    ab = jnp.asarray(split_ray[pidx], jnp.int32)
                else:
                    rel = jnp.asarray(gkey[1], jnp.int32)
                    ab = jnp.asarray(gkey[0], jnp.int32)
                out = self._render_chunk(
                    self.state.params, self.statics, self.sampler.oct_dev,
                    ro, rd, rel, ab, bool(stage == STAGE_BLOCK))
                pred[ids] = np.asarray(out["rgb"])[: len(ids)]
        mse = float(np.mean((pred - batch["image"]) ** 2))
        return {"eval_rgb_mse": mse,
                "eval_psnr": -10.0 * np.log10(mse + 1e-12)}

    # ----------------------------------------------------------- rendering ----

    def render_camera(self, cameras_host, camera_idx: int, step: int,
                      downscale: int = 1,
                      rel_camera_index: Optional[int] = None,
                      stage: Optional[int] = None,
                      force_split_idx: Optional[int] = None):
        """Chunked full-image render (Model.get_outputs_for_camera_ray_bundle,
        base_model.py:162-186).

        ``force_split_idx`` overrides the nearest-camera block lookup
        (diagnostics: render every block's residual from the same view)."""
        from gfnerf_tpu.cameras.cameras import generate_rays

        h = int(cameras_host.height[camera_idx]) // downscale
        w = int(cameras_host.width[camera_idx]) // downscale
        coords = get_image_coords(h, w) * downscale
        cams_dev = (cameras_host.to_device()
                    if not hasattr(cameras_host, "fx") or
                    isinstance(cameras_host.fx, np.ndarray)
                    else cameras_host)
        rays = generate_rays(cams_dev, camera_idx, jnp.asarray(coords))
        origin = np.asarray(rays["origins"]).reshape(-1, 3)[0]

        if stage is None:
            stage = self.stage_of(step)
        split_idx, nearest = self.sampler.get_nearest_split_dataset(origin)
        if force_split_idx is not None:
            split_idx = force_split_idx
        if rel_camera_index is None:
            rel_camera_index = nearest

        chunk = self.config.eval_num_rays_per_chunk
        o = np.asarray(rays["origins"]).reshape(-1, 3)
        d = np.asarray(rays["directions"]).reshape(-1, 3)
        n = o.shape[0]
        chunks, lens = [], []
        for start in range(0, n, chunk):
            end = min(start + chunk, n)
            ro = jnp.asarray(o[start:end])
            rd = jnp.asarray(d[start:end])
            if end - start < chunk:  # pad to static chunk shape
                pad = chunk - (end - start)
                ro = jnp.concatenate([ro, jnp.tile(ro[-1:], (pad, 1))])
                rd = jnp.concatenate([rd, jnp.tile(rd[-1:], (pad, 1))])
            chunks.append((ro, rd))
            lens.append(end - start)
        rel = jnp.asarray(rel_camera_index, jnp.int32)
        ab = jnp.asarray(max(split_idx, 0), jnp.int32)
        is_block = bool(stage == STAGE_BLOCK)
        if self._early_renderer is not None:
            raw = self._early_renderer.render_chunks(
                self.state.params, self.statics, self.sampler.oct_dev,
                chunks, rel, ab, is_block)
            outs = [{k: v[:m] for k, v in out.items()}
                    for out, m in zip(raw, lens)]
        else:
            outs = []
            for (ro, rd), m in zip(chunks, lens):
                out = self._render_chunk(
                    self.state.params, self.statics, self.sampler.oct_dev,
                    ro, rd, rel, ab, is_block)
                outs.append({k: np.asarray(v)[:m] for k, v in out.items()})
        result = {k: np.concatenate([o[k] for o in outs]).reshape(h, w, -1)
                  for k in outs[0]}
        return result

    def render_init_error_maps(self, step: int):
        """Render all train views at 1/8 res and save |err| maps
        (nerfacto.py:361-427)."""
        import imageio.v2 as imageio

        sample_tmp = self.base_dir / "sample_tmp"
        self.sample_tmp_dir = str(sample_tmp)
        for sub in ("gt", "pred", "npy", "png"):
            os.makedirs(sample_tmp / sub, exist_ok=True)

        dm = self.datamanager
        cams = dm.train_dataparser_outputs.cameras
        filenames = dm.train_dataparser_outputs.image_filenames
        down = 8
        for idx in range(len(cams)):
            base = os.path.basename(str(filenames[idx]))
            gt = dm.train_dataset.get_image(idx)  # (H, W, 3)
            h, w = gt.shape[:2]
            out = self.render_camera(cams, idx, step, downscale=down,
                                     rel_camera_index=dm.train_dataset
                                     .metadata["global_image_indices"][idx],
                                     stage=STAGE_INIT)
            pred_small = out["rgb"]
            # nearest upsample to full res (nerfacto.py:404-406)
            pred = pred_small.repeat(down, axis=0).repeat(down, axis=1)[:h, :w]
            if pred.shape[:2] != (h, w):
                ph, pw = pred.shape[:2]
                pred = np.pad(pred, ((0, h - ph), (0, w - pw), (0, 0)),
                              mode="edge")
            error = np.abs(gt - pred).sum(axis=-1)  # (H, W)
            np.save(sample_tmp / "npy" / (base + ".npy"), error)
            to8 = lambda x: (np.clip(x, 0, 1) * 255).astype(np.uint8)
            imageio.imwrite(sample_tmp / "png" / (base + ".png"),
                            to8(error / max(error.max(), 1e-6)))
            imageio.imwrite(sample_tmp / "gt" / (base + ".png"), to8(gt))
            imageio.imwrite(sample_tmp / "pred" / (base + ".png"), to8(pred))

    # ---------------------------------------------------------------- eval ----

    @profiler.time_function
    def get_eval_image_metrics_and_images(self, step: int, idx: int = 0):
        """PSNR/SSIM (+LPIPS when available) on one eval image
        (gf_pipeline.py:195-268, nerfacto.py:716-747)."""
        import time as _time

        dm = self.datamanager
        cam_idx, data = dm.next_eval_image(idx)
        gt = data["image"]
        t0 = _time.perf_counter()
        out = self.render_camera(dm.eval_dataparser_outputs.cameras, cam_idx,
                                 step)
        dt = _time.perf_counter() - t0
        pred = out["rgb"]
        mse = float(np.mean((pred - gt) ** 2))
        from gfnerf_tpu.model_components.lpips import lpips

        metrics = {
            "psnr": -10.0 * np.log10(mse + 1e-12),
            "ssim": float(compute_ssim(pred, gt)),
            # self-consistent perceptual metric; named _proxy because it is
            # NOT comparable to pretrained-LPIPS tables
            # (model_components/lpips.py)
            "lpips_proxy": float(lpips(jnp.asarray(pred), jnp.asarray(gt))),
            "num_rays_per_sec": gt.shape[0] * gt.shape[1] / dt,
            "fps": 1.0 / dt,
        }
        images = {"img": np.concatenate([gt, pred], axis=1),
                  "depth": out["depth"], "accumulation": out["accumulation"]}
        return metrics, images

    def get_average_eval_image_metrics(self, step: int):
        dm = self.datamanager
        n = len(dm.eval_dataset)
        all_metrics = []
        for i in range(n):
            m, _ = self.get_eval_image_metrics_and_images(step, i)
            all_metrics.append(m)
        return {k: float(np.mean([m[k] for m in all_metrics]))
                for k in all_metrics[0]}

    # ------------------------------------------------------- checkpointing ----

    def save_checkpoint_state(self, ckpt_dir, step: int):
        """Device state via orbax + host octree/labels/milestones as npz
        (the reference serializes the same native state through state-dict
        hooks, SURVEY.md §5)."""
        import json

        import orbax.checkpoint as ocp

        ckpt_dir = Path(ckpt_dir)
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(
            (ckpt_dir / "state").absolute(),
            {"params": self.state.params, "opt_state": self.state.opt_state,
             "step": self.state.step, "statics": self.statics},
        )
        t = self.sampler.tree
        np.savez(
            ckpt_dir / "octree.npz",
            centers=t.centers, side_lens=t.side_lens, parents=t.parents,
            childs=t.childs, is_leaf=t.is_leaf,
            trans_idx=np.asarray(self.sampler.oct_dev.trans_idx[:t.n_nodes]),
            block_idx=t.block_idx,
            weight_stats=np.asarray(
                self.sampler.oct_dev.weight_stats[:t.n_nodes]),
            alpha_stats=np.asarray(
                self.sampler.oct_dev.alpha_stats[:t.n_nodes]),
            visit_cnt=np.asarray(self.sampler.oct_dev.visit_cnt[:t.n_nodes]),
            w2xz=t.w2xz, weight=t.weight, t_center=t.t_center,
            t_dis_summary=t.t_dis_summary, t_side_len=t.t_side_len,
            milestones=np.asarray(self.sampler.milestones, np.int64),
            cameras_labels=(self.sampler.cameras_labels
                            if self.sampler.cameras_labels is not None
                            else np.array([])),
            step=step,
        )
        (ckpt_dir / "meta.json").write_text(json.dumps(
            {"step": step, "sample_tmp_dir": self.sample_tmp_dir or ""}))

    def load_checkpoint_state(self, ckpt_dir) -> int:
        import dataclasses as dc
        import json

        import orbax.checkpoint as ocp

        from gfnerf_tpu.models.gfnerf import TrainState
        from gfnerf_tpu.sampler.perssampler import octree_to_device

        ckpt_dir = Path(ckpt_dir)
        ckptr = ocp.PyTreeCheckpointer()
        target = {"params": self.state.params,
                  "opt_state": self.state.opt_state,
                  "step": self.state.step, "statics": self.statics}
        restored = ckptr.restore((ckpt_dir / "state").absolute(), item=target)
        self.state = TrainState(params=restored["params"],
                                opt_state=restored["opt_state"],
                                step=restored["step"])
        self.statics = restored["statics"]

        data = np.load(ckpt_dir / "octree.npz", allow_pickle=True)
        self.sampler.tree = dc.replace(
            self.sampler.tree,
            centers=data["centers"], side_lens=data["side_lens"],
            parents=data["parents"], childs=data["childs"],
            is_leaf=data["is_leaf"], trans_idx=data["trans_idx"],
            block_idx=data["block_idx"],
            weight_stats=data["weight_stats"].astype(np.int64),
            alpha_stats=data["alpha_stats"].astype(np.int64),
            visit_cnt=data["visit_cnt"].astype(np.int64),
            w2xz=data["w2xz"], weight=data["weight"],
            t_center=data["t_center"], t_dis_summary=data["t_dis_summary"],
            t_side_len=data["t_side_len"],
        )
        while self.sampler.tree.n_nodes > self.sampler.capacity:
            self.sampler.capacity *= 2
        self.sampler.oct_dev = octree_to_device(self.sampler.tree,
                                                self.sampler.capacity)
        self.sampler.milestones = list(data["milestones"])
        labels = data["cameras_labels"]
        self.sampler.cameras_labels = labels if labels.size else None
        meta = json.loads((ckpt_dir / "meta.json").read_text())
        self.sample_tmp_dir = meta["sample_tmp_dir"] or None
        # the restored tree can be far deeper than the fresh build the
        # manager calibrated max_hits on — regrow + retrace if needed
        if self.sampler.recalibrate_max_hits():
            self._build_step_fns()
        return int(meta["step"])



def compute_ssim(a: np.ndarray, b: np.ndarray) -> float:
    """SSIM (11x11 gaussian, standard constants) in numpy."""
    from scipy.ndimage import gaussian_filter

    a = a.astype(np.float64)
    b = b.astype(np.float64)
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    vals = []
    for ch in range(a.shape[-1]):
        x, y = a[..., ch], b[..., ch]
        mx = gaussian_filter(x, 1.5)
        my = gaussian_filter(y, 1.5)
        mxy = gaussian_filter(x * y, 1.5)
        mxx = gaussian_filter(x * x, 1.5)
        myy = gaussian_filter(y * y, 1.5)
        vx = mxx - mx ** 2
        vy = myy - my ** 2
        cov = mxy - mx * my
        s = ((2 * mx * my + c1) * (2 * cov + c2)) / (
            (mx ** 2 + my ** 2 + c1) * (vx + vy + c2))
        vals.append(s.mean())
    return float(np.mean(vals))
