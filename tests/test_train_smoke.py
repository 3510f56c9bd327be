"""Integration smoke test: the real train loop over the stage transition.

Equivalent of the reference's ``tests/test_train.py`` (SURVEY.md §4): shrink
the method config, run the actual Trainer for enough steps to cross the
init -> focal transition (error-map render, camera clustering, split switch,
block-stage steps), and check losses/metrics are finite and the machinery
fired.
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def synthetic_dataset(tmp_path_factory):
    from gfnerf_tpu.utils.synthetic import make_synthetic_npz

    path = tmp_path_factory.mktemp("scene")
    make_synthetic_npz(path, n_train=12, n_val=2, img_wh=(32, 24))
    return path


def test_train_loop_crosses_stage_transition(synthetic_dataset, tmp_path):
    from gfnerf_tpu.configs.method_configs import gf_nerf_tiny_config
    from gfnerf_tpu.data.dataparsers.minimal_parser import (
        MinimalDataParser, MinimalDataParserConfig)
    from gfnerf_tpu.engine.trainer import Trainer

    cfg = gf_nerf_tiny_config()
    cfg.max_num_iterations = 16   # init ends at 10; 6 block steps
    cfg.output_dir = tmp_path / "outputs"
    cfg.vis = "local"
    cfg.data = synthetic_dataset
    cfg.steps_per_save = 15
    cfg.pipeline.datamanager.train_num_rays_per_batch = 128
    cfg.pipeline.model.s3im_patch_height = 8

    parser = MinimalDataParser(MinimalDataParserConfig(data=synthetic_dataset))
    trainer = Trainer(cfg, parser)
    trainer.setup()
    trainer.train()

    p = trainer.pipeline
    # stage machinery fired
    assert p.sampler.cameras_labels is not None
    assert p.sample_tmp_dir is not None
    assert p.datamanager.split_cache is not None
    # checkpoint written and pruned to latest
    ckpts = sorted((trainer.base_dir / "nerfstudio_models").glob("step-*"))
    assert len(ckpts) == 1

    # resume from checkpoint
    cfg2 = gf_nerf_tiny_config()
    cfg2.max_num_iterations = 18
    cfg2.output_dir = tmp_path / "outputs2"
    cfg2.vis = "local"
    cfg2.data = synthetic_dataset
    cfg2.load_dir = trainer.base_dir / "nerfstudio_models"
    cfg2.pipeline.datamanager.train_num_rays_per_batch = 128
    cfg2.pipeline.model.s3im_patch_height = 8
    trainer2 = Trainer(cfg2, parser)
    trainer2.setup()
    assert trainer2._start_step == 16
    trainer2.train()

    # eval path produces finite metrics
    metrics, images = p.get_eval_image_metrics_and_images(step=16, idx=0)
    assert np.isfinite(metrics["psnr"])
    assert images["img"].shape[1] == 2 * 32  # gt|pred side by side


def test_semantic_training_path(tmp_path):
    """use_semantics: road-mask labels flow from the npz through the cache to
    a cross-entropy loss term in the train step."""
    import numpy as np

    from gfnerf_tpu.configs.method_configs import gf_nerf_tiny_config
    from gfnerf_tpu.data.dataparsers.minimal_parser import (
        MinimalDataParser, MinimalDataParserConfig)
    from gfnerf_tpu.engine.trainer import Trainer
    from gfnerf_tpu.utils.synthetic import make_synthetic_npz

    path = tmp_path / "scene"
    make_synthetic_npz(path, n_train=8, n_val=2, img_wh=(24, 16))
    # add binary road masks to the npz (lower half of each image = class 1)
    for split in ("train", "val"):
        d = dict(np.load(path / f"{split}.npz"))
        n, h, w = d["images"].shape[:3]
        masks = np.zeros((n, h, w), np.float32)
        masks[:, h // 2:, :] = 1.0
        d["road_masks"] = masks
        np.savez(path / f"{split}.npz", **d)

    cfg = gf_nerf_tiny_config()
    cfg.max_num_iterations = 3
    cfg.output_dir = tmp_path / "out"
    cfg.vis = "local"
    cfg.data = path
    cfg.steps_per_save = 10 ** 9
    cfg.pipeline.datamanager.train_num_rays_per_batch = 64
    cfg.pipeline.model.use_semantics = True
    cfg.pipeline.model.semantic_loss_weight = 0.5
    cfg.pipeline.model.s3im_patch_height = 8

    parser = MinimalDataParser(MinimalDataParserConfig(data=path))
    trainer = Trainer(cfg, parser)
    trainer.setup()
    m = trainer.pipeline.get_train_loss_dict(0)
    assert "semantics_loss" in m
    assert np.isfinite(m["semantics_loss"])


def test_camera_optimizer_path(tmp_path):
    """camera_opt_mode=SO3xR3: pose tangents receive gradients in init stage
    and stay frozen in the focal stage."""
    import numpy as np

    from gfnerf_tpu.configs.method_configs import gf_nerf_tiny_config
    from gfnerf_tpu.data.dataparsers.minimal_parser import (
        MinimalDataParser, MinimalDataParserConfig)
    from gfnerf_tpu.engine.trainer import Trainer
    from gfnerf_tpu.utils.synthetic import make_synthetic_npz

    path = tmp_path / "scene"
    make_synthetic_npz(path, n_train=8, n_val=2, img_wh=(24, 16))
    cfg = gf_nerf_tiny_config()
    cfg.max_num_iterations = 14
    cfg.output_dir = tmp_path / "out"
    cfg.vis = "local"
    cfg.data = path
    cfg.steps_per_save = 10 ** 9
    cfg.pipeline.datamanager.train_num_rays_per_batch = 64
    cfg.pipeline.model.s3im_patch_height = 8
    cfg.pipeline.camera_opt_mode = "SO3xR3"

    parser = MinimalDataParser(MinimalDataParserConfig(data=path))
    trainer = Trainer(cfg, parser)
    trainer.setup()
    p = trainer.pipeline
    assert p.state.params.camera_adjustment is not None
    for step in range(10):
        m = p.get_train_loss_dict(step)
        p.after_train_iteration(step)
    assert "camera_opt_regularizer" in m
    adj_after_init_signed = np.asarray(p.state.params.camera_adjustment).copy()
    adj_after_init = np.abs(adj_after_init_signed)
    assert adj_after_init.max() > 0, "poses did not move in init stage"
    for step in range(10, 14):
        p.get_train_loss_dict(step)
        p.after_train_iteration(step)
    adj_final = np.asarray(p.state.params.camera_adjustment)
    np.testing.assert_allclose(
        adj_final, np.asarray(adj_after_init_signed),
        err_msg="poses moved during the focal stage (must be frozen)")


def test_k_step_dispatch_training(synthetic_dataset, tmp_path):
    """steps_per_dispatch > 1: the scanned multi-step path trains across the
    full schedule — windows interleave with single-step fallbacks at every
    milestone (4, 8), the stage transition (10), and split switches (20) —
    and the focal error maps receive all K per-step error vectors
    (VERDICT r3 weak 7: writeback cadence under K-step dispatch)."""
    from gfnerf_tpu.configs.method_configs import gf_nerf_tiny_config
    from gfnerf_tpu.data.dataparsers.minimal_parser import (
        MinimalDataParser, MinimalDataParserConfig)
    from gfnerf_tpu.engine.trainer import Trainer

    cfg = gf_nerf_tiny_config()
    cfg.max_num_iterations = 30
    cfg.output_dir = tmp_path / "outputs_k"
    cfg.vis = "local"
    cfg.data = synthetic_dataset
    cfg.pipeline.datamanager.train_num_rays_per_batch = 128
    cfg.pipeline.model.s3im_patch_height = 8
    cfg.pipeline.steps_per_dispatch = 4

    parser = MinimalDataParser(MinimalDataParserConfig(data=synthetic_dataset))
    trainer = Trainer(cfg, parser)
    trainer.setup()
    trainer.train()

    p = trainer.pipeline
    # scanned dispatches actually ran (both stages), and every buffered
    # per-step metric was consumed
    assert len(p._multi_step_fns) >= 1
    assert p._pending_metrics == {}
    # the state advanced exactly to the end: windows never overshot the
    # final iteration or a boundary
    assert int(p.state.step) == 30
    # focal error maps were written by the stacked writeback
    assert p.datamanager.split_cache is not None
    maps = p.datamanager.split_cache.error_maps
    assert maps is not None and np.asarray(maps).max() > 0

    metrics, _ = p.get_eval_image_metrics_and_images(step=30, idx=0)
    assert np.isfinite(metrics["psnr"])
