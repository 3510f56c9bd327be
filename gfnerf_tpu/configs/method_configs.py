"""Method registry + plugin discovery.

Equivalent of ``nerfstudio/configs/method_configs.py`` (the method table) and
``nerfstudio/plugins/registry.py:34-50`` (entry-point discovery — the
mechanism through which the reference injects "gf-nerf" via
``pyproject.toml:174-176``).  External packages can register methods under
the entry-point group ``gfnerf_tpu.method_configs``.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict

from gfnerf_tpu.data.datamanager import GFNerfDataManagerConfig
from gfnerf_tpu.engine.optimizers import OptimizersConfig
from gfnerf_tpu.engine.trainer import TrainerConfig
from gfnerf_tpu.models.gfnerf import GFNeRFModelConfig
from gfnerf_tpu.pipelines.pipeline import GFNerfPipelineConfig
from gfnerf_tpu.sampler.manager import PersSamplerManagerConfig


@dataclasses.dataclass
class MethodSpecification:
    """Plugin registration type (nerfstudio/plugins/types.py)."""

    config: TrainerConfig
    description: str = ""


def gf_nerf_config() -> TrainerConfig:
    """The paper method, defaults from gfnerf/config.py:43-148."""
    n_blocks = 10
    n_split_dataset = 10
    n_dataset_circles = 1
    steps_init = 30000
    steps_per_split = 10000
    scale_factor = 10.0
    return TrainerConfig(
        method_name="gf-nerf",
        steps_per_eval_batch=1000,
        steps_per_save=2000,
        max_num_iterations=steps_init
        + n_dataset_circles * steps_per_split * n_split_dataset,
        pipeline=GFNerfPipelineConfig(
            datamanager=GFNerfDataManagerConfig(
                n_split_dataset=n_split_dataset,
                steps_per_split_dataset=steps_per_split,
                steps_perssampler_init=steps_init,
                train_num_rays_per_batch=2048 * 4,
                eval_num_rays_per_batch=2048,
                train_num_images_to_sample_from=500,
                train_num_times_to_repeat_images=1000,
                patch_size=1,
            ),
            model=GFNeRFModelConfig(
                n_blocks=n_blocks,
                n_split_dataset=n_split_dataset,
                steps_per_split_dataset=steps_per_split,
                steps_perssampler_init=steps_init,
                scale_factor=scale_factor,
                s3im_loss_mult=1.0,
                s3im_kernel_size=4,
                s3im_stride=4,
                s3im_repeat_time=10,
                s3im_patch_height=32,
                use_ch_loss=True,
                background_color="black",
            ),
            sampler=PersSamplerManagerConfig(),
            optimizers=OptimizersConfig(
                fields_lr_init=1e-2,
                fields_lr_final=1e-4,
                steps_perssampler_init=steps_init,
                steps_per_split_dataset=steps_per_split,
                n_split_dataset=n_split_dataset,
                n_dataset_circles=n_dataset_circles,
            ),
            field_log2_hashmap_size=21,
            field_num_levels=16,
            field_hidden_dim=128,
            field_hidden_dim_color=128,
            eval_num_rays_per_chunk=2048,
        ),
    )


def gf_nerf_tiny_config() -> TrainerConfig:
    """Shrunk config for smoke tests / small scenes (SURVEY.md §4 pattern)."""
    cfg = gf_nerf_config()
    cfg.method_name = "gf-nerf-tiny"
    cfg.max_num_iterations = 30
    p = cfg.pipeline
    p.datamanager.train_num_rays_per_batch = 256
    p.datamanager.eval_num_rays_per_batch = 256
    p.datamanager.n_split_dataset = 2
    p.datamanager.steps_per_split_dataset = 10
    p.datamanager.steps_perssampler_init = 10
    p.model.n_blocks = 2
    p.model.n_split_dataset = 2
    p.model.steps_per_split_dataset = 10
    p.model.steps_perssampler_init = 10
    p.model.s3im_patch_height = 16
    p.model.scale_factor = 1.0
    p.sampler.bbox_levels = 4
    p.sampler.max_level = 6
    p.sampler.max_samples = 64
    p.sampler.sample_l = 1.0 / 32
    p.sampler.sub_div_milestones = (4, 8)
    p.sampler.compact_freq = 10
    p.sampler.node_capacity = 16384
    p.sampler.n_rand_pts = 512
    p.sampler.vis_res_w = 32
    p.sampler.ray_march_fineness_decay_end_iter = 10
    p.field_log2_hashmap_size = 12
    p.eval_num_rays_per_chunk = 512
    p.optimizers.steps_perssampler_init = 10
    p.optimizers.steps_per_split_dataset = 10
    p.optimizers.n_split_dataset = 2
    cfg.steps_per_eval_batch = 10
    cfg.steps_per_eval_image = 10 ** 9
    cfg.steps_per_save = 10 ** 9
    return cfg


def gf_nerf_perf_config() -> TrainerConfig:
    """Throughput-tuned gf-nerf: supercell-packed hash tables (one wide-row
    gather per point-level instead of 8 corner gathers — hash lookup rows are
    the TPU cost currency, PERF_NOTES.md), 8 levels x 4 channels, tighter
    compaction budget. Quality to be validated against the parity config;
    use gf-nerf for paper-faithful hyperparameters."""
    cfg = gf_nerf_config()
    cfg.method_name = "gf-nerf-perf"
    p = cfg.pipeline
    p.field_num_levels = 8
    p.field_features_per_level = 4
    p.field_hash_layout = "packed"
    p.field_mlp_dtype = "bfloat16"
    # 2^15 rows x 128 f32 = 16 MB/level — the parity config's bytes/level
    p.field_packed_rows_log2 = 15
    p.model.samples_budget_per_ray = 160
    # march directly at the budget: placement fills sample slots in leaf
    # order, so marching S slots == marching 1024 then keeping the first S
    # valid samples — the compaction pass disappears entirely
    p.sampler.max_samples = 160
    # amortize the ~100 ms host dispatch over 8 scanned steps (the bench's
    # measured fast path; eval/save cadences above are multiples of 8)
    p.steps_per_dispatch = 8
    return cfg


def gf_nerf_prop_config() -> TrainerConfig:
    """gf-nerf with proposal-guided resampling: the marched lattice feeds a
    cheap density probe whose weights importance-resample 64 fine samples
    for the main field — crisper geometry than budget-capped dense marching
    (QUALITY.md finding 1) at fewer main-field hash rows. A TPU-first
    improvement over the reference's occupancy-only march."""
    cfg = gf_nerf_perf_config()
    cfg.method_name = "gf-nerf-prop"
    p = cfg.pipeline
    p.field_use_proposal = True
    p.model.num_proposal_resamples = 64
    # proposal needs the dense march (budget >= marched slots)
    p.sampler.max_samples = 256
    p.model.samples_budget_per_ray = 256
    return cfg


def nerfacto_config() -> TrainerConfig:
    """Stock nerfacto (proposal sampler + hash field, BASELINE configs[0])."""
    from gfnerf_tpu.pipelines.vanilla_pipeline import VanillaPipelineConfig

    return TrainerConfig(
        method_name="nerfacto",
        max_num_iterations=30000,
        steps_per_eval_image=5000,
        steps_per_save=2000,
        pipeline=VanillaPipelineConfig(model_kind="nerfacto",
                                       train_num_rays_per_batch=4096),
    )


def instant_ngp_config() -> TrainerConfig:
    """Instant-NGP-class model: hash field + occupancy-grid sampling."""
    from gfnerf_tpu.pipelines.vanilla_pipeline import VanillaPipelineConfig

    return TrainerConfig(
        method_name="instant-ngp",
        max_num_iterations=30000,
        steps_per_eval_image=5000,
        steps_per_save=2000,
        pipeline=VanillaPipelineConfig(model_kind="instant-ngp",
                                       train_num_rays_per_batch=4096),
    )


def mipnerf_config() -> TrainerConfig:
    """mip-NeRF: integrated positional encoding over conical frustums."""
    from gfnerf_tpu.pipelines.vanilla_pipeline import VanillaPipelineConfig

    return TrainerConfig(
        method_name="mipnerf",
        max_num_iterations=100000,
        steps_per_eval_image=10000,
        steps_per_save=5000,
        pipeline=VanillaPipelineConfig(model_kind="mipnerf",
                                       train_num_rays_per_batch=1024,
                                       lr_init=5e-4, lr_final=5e-6,
                                       max_steps=100000),
    )


def tensorf_config() -> TrainerConfig:
    """TensoRF with vector-matrix factorization."""
    from gfnerf_tpu.pipelines.vanilla_pipeline import VanillaPipelineConfig

    return TrainerConfig(
        method_name="tensorf",
        max_num_iterations=30000,
        steps_per_eval_image=5000,
        steps_per_save=2000,
        pipeline=VanillaPipelineConfig(model_kind="tensorf",
                                       train_num_rays_per_batch=4096,
                                       lr_init=2e-2, lr_final=2e-3),
    )


def neus_config() -> TrainerConfig:
    """NeuS surface reconstruction (SDF field + eikonal)."""
    from gfnerf_tpu.pipelines.vanilla_pipeline import VanillaPipelineConfig

    return TrainerConfig(
        method_name="neus",
        max_num_iterations=100000,
        steps_per_eval_image=10000,
        steps_per_save=5000,
        pipeline=VanillaPipelineConfig(model_kind="neus",
                                       train_num_rays_per_batch=1024,
                                       lr_init=5e-4, lr_final=2.5e-5,
                                       max_steps=100000),
    )


def nerfplayer_nerfacto_config() -> TrainerConfig:
    """NeRFPlayer on the nerfacto pipeline: time-conditioned temporal grids
    (fields/temporal_grid.py) + temporal TV loss."""
    from gfnerf_tpu.pipelines.vanilla_pipeline import VanillaPipelineConfig

    return TrainerConfig(
        method_name="nerfplayer-nerfacto",
        max_num_iterations=30000,
        steps_per_eval_image=5000,
        steps_per_save=2000,
        pipeline=VanillaPipelineConfig(model_kind="nerfplayer-nerfacto",
                                       train_num_rays_per_batch=4096),
    )


def nerfplayer_ngp_config() -> TrainerConfig:
    """NeRFPlayer on the instant-NGP pipeline (occupancy grid updated at
    randomized times + temporal field)."""
    from gfnerf_tpu.pipelines.vanilla_pipeline import VanillaPipelineConfig

    return TrainerConfig(
        method_name="nerfplayer-ngp",
        max_num_iterations=30000,
        steps_per_eval_image=5000,
        steps_per_save=2000,
        pipeline=VanillaPipelineConfig(model_kind="nerfplayer-ngp",
                                       train_num_rays_per_batch=4096),
    )


def semantic_nerfw_config() -> TrainerConfig:
    """Semantic NeRF-W: nerfacto + semantics head + CE supervision."""
    from gfnerf_tpu.pipelines.vanilla_pipeline import VanillaPipelineConfig

    return TrainerConfig(
        method_name="semantic-nerfw",
        max_num_iterations=30000,
        steps_per_eval_image=5000,
        steps_per_save=2000,
        pipeline=VanillaPipelineConfig(model_kind="semantic-nerfw",
                                       train_num_rays_per_batch=4096),
    )


def vanilla_nerf_config() -> TrainerConfig:
    """Original NeRF: frequency encoding + coarse/fine MLPs."""
    from gfnerf_tpu.pipelines.vanilla_pipeline import VanillaPipelineConfig

    return TrainerConfig(
        method_name="vanilla-nerf",
        max_num_iterations=100000,
        steps_per_eval_image=10000,
        steps_per_save=5000,
        pipeline=VanillaPipelineConfig(model_kind="vanilla-nerf",
                                       train_num_rays_per_batch=1024,
                                       lr_init=5e-4, lr_final=5e-5,
                                       max_steps=100000),
    )


method_configs: Dict[str, Callable[[], TrainerConfig]] = {
    "gf-nerf": gf_nerf_config,
    "gf-nerf-tiny": gf_nerf_tiny_config,
    "gf-nerf-perf": gf_nerf_perf_config,
    "gf-nerf-prop": gf_nerf_prop_config,
    "nerfacto": nerfacto_config,
    "instant-ngp": instant_ngp_config,
    "mipnerf": mipnerf_config,
    "tensorf": tensorf_config,
    "neus": neus_config,
    "vanilla-nerf": vanilla_nerf_config,
    "nerfplayer-nerfacto": nerfplayer_nerfacto_config,
    "nerfplayer-ngp": nerfplayer_ngp_config,
    "semantic-nerfw": semantic_nerfw_config,
}

descriptions = {
    "gf-nerf": "Global-guided Focal NeRF (two-stage, TPU-native).",
    "gf-nerf-tiny": "Shrunk gf-nerf for smoke tests.",
    "gf-nerf-perf": "Throughput-tuned gf-nerf (8 levels x 4 channels).",
    "nerfacto": "Proposal-sampler + hash-field model (nerfstudio nerfacto).",
    "instant-ngp": "Hash field + occupancy-grid sampler (instant-ngp).",
    "mipnerf": "mip-NeRF (integrated positional encoding, coarse/fine).",
    "tensorf": "TensoRF (vector-matrix factorized field).",
    "neus": "NeuS surface reconstruction (SDF field + eikonal).",
    "vanilla-nerf": "Original NeRF (frequency encoding, coarse/fine MLPs).",
}


def discover_methods() -> Dict[str, Callable[[], TrainerConfig]]:
    """Entry-point plugin discovery (plugins/registry.py:34-50)."""
    methods = dict(method_configs)
    try:
        from importlib.metadata import entry_points

        for ep in entry_points(group="gfnerf_tpu.method_configs"):
            spec = ep.load()
            if callable(spec) and not isinstance(spec, MethodSpecification):
                spec = spec()
            if isinstance(spec, MethodSpecification):
                methods[spec.config.method_name] = (
                    lambda s=spec: dataclasses.replace(s.config))
                descriptions[spec.config.method_name] = spec.description
    except Exception as e:
        print(f"[plugins] discovery failed: {e}")
    return methods
