"""Focal-stage fix semantics (QUALITY.md finding 7, round-4 fixes).

(a) empty-space penalty: ``field_density(..., with_shared=True)`` returns
    the frozen shared branch's density; the penalty term is zero when the
    residual tables are zero (their init) and positive when a residual adds
    density where the shared branch says empty.
(c) mixed full-scene rays: the datamanager appends
    ``focal_uniform_fraction`` of the batch from the FULL init dataset,
    marks the boundary in ``n_split_rays``, and the error-map writeback
    excludes the mixed tail.
"""

import numpy as np
import pytest


# ------------------------------------------------------------- fix (a) ----

def _tiny_field(n_blocks=2):
    from gfnerf_tpu.fields.field import FieldConfig, init_field_params

    cfg = FieldConfig(num_images=4, n_volumes=3, num_levels=4,
                      features_per_level=4, hash_layout="packed",
                      packed_rows_log2=8, n_blocks=n_blocks,
                      hidden_dim=32, hidden_dim_color=32)
    params, statics = init_field_params(cfg, seed=0)
    return cfg, params, statics


def test_with_shared_matches_density_at_zero_residual():
    import jax.numpy as jnp

    from gfnerf_tpu.fields.field import STAGE_BLOCK, field_density

    cfg, params, statics = _tiny_field()
    rng = np.random.default_rng(1)
    pts = jnp.asarray(rng.uniform(-1.4, 1.4, (64, 3)), jnp.float32)
    anc = jnp.asarray(rng.integers(0, 3, (64,)), jnp.int32)

    # residual tables init to zero -> focal density == shared density
    d, geo, ds = field_density(params, statics, cfg, pts, anc,
                               STAGE_BLOCK, 0, with_shared=True)
    np.testing.assert_allclose(np.asarray(d), np.asarray(ds),
                               rtol=1e-5, atol=1e-6)

    # a nonzero residual must move density away from shared somewhere
    bumped = params.replace(
        block_feats=params.block_feats.at[0].set(0.5))
    d2, _, ds2 = field_density(bumped, statics, cfg, pts, anc,
                               STAGE_BLOCK, 0, with_shared=True)
    np.testing.assert_allclose(np.asarray(ds2), np.asarray(ds), rtol=1e-5,
                               atol=1e-6)  # shared branch untouched
    assert np.abs(np.asarray(d2) - np.asarray(ds2)).max() > 1e-4


def test_empty_space_penalty_in_focal_metrics():
    """Train-step metrics gain empty_space_loss in the focal stage; it is 0
    with zero residuals and > 0 once a residual adds density in empty
    space."""
    import jax
    import jax.numpy as jnp

    from gfnerf_tpu.engine.optimizers import (OptimizersConfig,
                                              build_optimizer, optimizer_arg)
    from gfnerf_tpu.fields.field import STAGE_BLOCK
    from gfnerf_tpu.models.gfnerf import (GFNeRFModelConfig, TrainState,
                                          make_train_step)
    from gfnerf_tpu.data.dataparsers.base import CamerasHost
    from gfnerf_tpu.sampler.octree import build_octree
    from gfnerf_tpu.sampler.perssampler import (SamplerConfig,
                                                octree_to_device)
    from tests.conftest import make_ring_cameras

    w, h = 32, 24
    c2w, intri = make_ring_cameras(6, img_wh=(w, h))
    fx, fy = intri[:, 0, 0], intri[:, 1, 1]
    cx, cy = intri[:, 0, 2], intri[:, 1, 2]
    bounds = np.tile(np.array([[0.01, 50.0]], np.float32), (6, 1))
    tree = build_octree(c2w, intri, bounds, max_depth=5, bbox_levels=3,
                        n_rand_pts=512, vis_res_w=16, seed=0)
    oct_dev = octree_to_device(tree, capacity=4096)

    from gfnerf_tpu.fields.field import FieldConfig, init_field_params

    S = 32
    scfg = SamplerConfig(max_samples=S, sample_l=1.0 / 64, locate_iters=8)
    fcfg = FieldConfig(num_images=6, n_volumes=tree.n_volumes, num_levels=4,
                       features_per_level=4, hash_layout="packed",
                       packed_rows_log2=8, n_blocks=2, hidden_dim=32,
                       hidden_dim_color=32)
    # tau=0.9: the untrained shared field is fog (density_bias=1 ->
    # alpha ~ 0.04 everywhere), so the production tau=0.01 would match no
    # samples; the test only pins the penalty mechanics
    mcfg = GFNeRFModelConfig(n_blocks=2, scale_factor=1.0,
                             samples_budget_per_ray=S,
                             s3im_loss_mult=0.0,
                             empty_space_penalty_mult=1.0,
                             empty_space_tau=0.9)
    params, statics = init_field_params(fcfg, seed=0)
    tx = build_optimizer(OptimizersConfig(), params)
    state = TrainState(params=params,
                       opt_state=tx.init(optimizer_arg(params)),
                       step=jnp.asarray(0, jnp.int32))
    step_fn = make_train_step(fcfg, mcfg, scfg, tx, STAGE_BLOCK)

    cams = CamerasHost(camera_to_worlds=c2w, fx=fx, fy=fy, cx=cx, cy=cy,
                       width=np.full(6, w, np.int32),
                       height=np.full(6, h, np.int32)).to_device()
    rng = np.random.default_rng(0)
    R = 64
    ki = rng.integers(0, 6, R)
    batch = {
        "camera_indices": jnp.asarray(ki, jnp.int32),
        "rel_camera_indices": jnp.asarray(ki, jnp.int32),
        "coords": jnp.asarray(np.stack(
            [rng.integers(0, h, R) + 0.5, rng.integers(0, w, R) + 0.5], -1),
            jnp.float32),
        "image": jnp.asarray(rng.random((R, 3)), jnp.float32),
    }
    key = jax.random.PRNGKey(0)
    fin = jnp.asarray(1.0)
    a0 = jnp.asarray(0, jnp.int32)

    # build the bumped state from COPIES before stepping: the train step
    # donates its state argument, deleting the original buffers (which the
    # bumped pytree would otherwise share)
    params2 = jax.tree_util.tree_map(jnp.copy, params)
    state2 = TrainState(
        params=params2.replace(
            block_feats=params2.block_feats.at[0].set(1.0)),
        opt_state=tx.init(optimizer_arg(params2)),
        step=jnp.asarray(0, jnp.int32))

    _, _, metrics, _ = step_fn(state, statics, oct_dev, cams, batch, fin,
                               a0, key)
    assert "empty_space_loss" in metrics
    assert float(metrics["empty_space_loss"]) == pytest.approx(0.0, abs=1e-8)

    # bumped block-0 residual: added density in (mostly empty) space must
    # trigger the penalty
    oct_dev2 = octree_to_device(tree, capacity=4096)
    _, _, m2, _ = step_fn(state2, statics, oct_dev2, cams, batch, fin, a0,
                          key)
    assert float(m2["empty_space_loss"]) > 1e-5


# ------------------------------------------------------------- fix (c) ----

def test_focal_uniform_fraction_mixes_full_scene_rays(tmp_path):
    from gfnerf_tpu.data.datamanager import (GFNerfDataManager,
                                             GFNerfDataManagerConfig)
    from gfnerf_tpu.data.dataparsers.minimal_parser import (
        MinimalDataParser, MinimalDataParserConfig)
    from gfnerf_tpu.utils.synthetic import make_synthetic_npz

    make_synthetic_npz(tmp_path, n_train=8, n_val=2, img_wh=(32, 24))
    parser = MinimalDataParser(MinimalDataParserConfig(data=tmp_path))
    cfg = GFNerfDataManagerConfig(
        n_split_dataset=2, steps_per_split_dataset=4,
        steps_perssampler_init=4, train_num_rays_per_batch=64,
        focal_uniform_fraction=0.25)
    dm = GFNerfDataManager(cfg, parser, seed=0)

    # init-stage batch: no mixing
    b = dm.next_train(0)
    assert int(b["n_split_rays"]) == 64

    # activate a split covering only cameras {0..3}
    labels = np.array([0, 0, 0, 0, 1, 1, 1, 1])
    dm.setup_train_split_oct(labels, 0, None)
    b = dm.next_train(5)
    ns = int(b["n_split_rays"])
    assert ns == 48            # 64 - round(0.25 * 64)
    assert b["image"].shape[0] == 64
    assert b["coords"].shape[0] == 64
    # split rays come from cluster-0 cameras only; the mixed tail spans the
    # full dataset (rel ids are global image indices)
    assert set(np.unique(b["rel_camera_indices"][:ns])) <= {0, 1, 2, 3}
    mixed = b["rel_camera_indices"][ns:]
    assert mixed.shape[0] == 16
    assert (mixed >= 4).any()  # at least one full-scene ray outside cluster 0


# ------------------------------------------------------------- fix (b) ----

def test_dense_levels_collision_free_and_grad_consistent():
    """Dense linear addressing (finding-7 fix (b)): within a volume, two
    distinct cells never share a row on a dense level; the custom-VJP grad
    matches autodiff of the raw forward."""
    import jax
    import jax.numpy as jnp

    from gfnerf_tpu.fields.packed_hash import (
        dense_level_extents, init_packed_hash_params, pack_for_channels,
        packed_hash_encode, packed_hash_encode_raw)

    C, rows_log2, V, L = 4, 12, 2, 4
    pack = pack_for_channels(C, 128)
    feat, prim, bias = init_packed_hash_params(
        seed=0, n_rows_log2=rows_log2, n_volumes=V, n_levels=L,
        n_channels=C)
    m, use = dense_level_extents(L, pack, V, 1 << rows_log2, dense_levels=2)
    assert use[0], "level 0 grid must fit a 2^12 table at V=2"

    # collision-free property on level 0: distinct cells -> distinct rows
    import numpy as np
    from gfnerf_tpu.fields.hash_encoding import _level_scales
    scale0 = _level_scales(L)[0]
    ml = int(m[0])
    span = int(np.ceil(scale0 / pack)) + 1
    assert span <= ml
    # dense rows across the whole grid of volume 0 vs volume 1 never alias
    rows0 = {(sx % ml) * ml * ml + (sy % ml) * ml + (sz % ml)
             for sx in range(span) for sy in range(span)
             for sz in range(span)}
    assert len(rows0) == span ** 3          # injective within a volume
    assert V * ml ** 3 <= (1 << rows_log2)  # volumes occupy disjoint ranges

    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.random((128, 3)), jnp.float32)
    anc = jnp.asarray(rng.integers(-1, V, 128), jnp.int32)
    out_vjp = packed_hash_encode(feat, prim, bias, pts, anc, C, pack, 2)
    out_raw = packed_hash_encode_raw(feat, prim, bias, pts, anc, C, pack, 2)
    np.testing.assert_allclose(np.asarray(out_vjp), np.asarray(out_raw),
                               rtol=1e-5, atol=1e-6)

    g_vjp = jax.grad(lambda f: (packed_hash_encode(
        f, prim, bias, pts, anc, C, pack, 2) ** 2).sum())(feat)
    g_raw = jax.grad(lambda f: (packed_hash_encode_raw(
        f, prim, bias, pts, anc, C, pack, 2) ** 2).sum())(feat)
    denom = float(jnp.abs(g_raw).max()) + 1e-9
    rel = float(jnp.abs(g_raw - g_vjp).max()) / denom
    assert rel < 0.02, rel


# ------------------------------------------- finetune focal mode (r5) ----

def test_finetune_mode_copy_equals_init_density():
    """focal_mode=finetune: with block tables seeded from the global table,
    focal-stage density is bit-equal to init-stage density (the copy is the
    same table through the same hash function)."""
    import jax.numpy as jnp

    from gfnerf_tpu.fields.field import (STAGE_BLOCK, STAGE_INIT,
                                         FieldConfig, field_density,
                                         field_density_routed,
                                         init_field_params)

    cfg = FieldConfig(num_images=4, n_volumes=3, num_levels=4,
                      features_per_level=4, hash_layout="packed",
                      packed_rows_log2=8, n_blocks=2, hidden_dim=32,
                      hidden_dim_color=32, focal_mode="finetune")
    params, statics = init_field_params(cfg, seed=0)
    # the transition copy (pipeline.after_train_iteration)
    params = params.replace(block_feats=jnp.broadcast_to(
        params.global_feat[None], params.block_feats.shape))

    rng = np.random.default_rng(2)
    pts = jnp.asarray(rng.uniform(-1.4, 1.4, (64, 3)), jnp.float32)
    anc = jnp.asarray(rng.integers(0, 3, (64,)), jnp.int32)

    d_init, g_init = field_density(params, statics, cfg, pts, anc,
                                   STAGE_INIT)
    for b in range(2):
        d_b, g_b = field_density(params, statics, cfg, pts, anc,
                                 STAGE_BLOCK, b)
        np.testing.assert_array_equal(np.asarray(d_b), np.asarray(d_init))
        np.testing.assert_array_equal(np.asarray(g_b), np.asarray(g_init))

    # routed eval agrees too (mixed per-point blocks)
    blk = jnp.asarray(rng.integers(0, 2, (64,)), jnp.int32)
    d_r, g_r = field_density_routed(params, statics, cfg, pts, anc, blk)
    np.testing.assert_array_equal(np.asarray(d_r), np.asarray(d_init))

    # diverging one block's copy moves that block only
    bumped = params.replace(
        block_feats=params.block_feats.at[1].add(0.25))
    d_b0, _ = field_density(bumped, statics, cfg, pts, anc, STAGE_BLOCK, 0)
    d_b1, _ = field_density(bumped, statics, cfg, pts, anc, STAGE_BLOCK, 1)
    np.testing.assert_array_equal(np.asarray(d_b0), np.asarray(d_init))
    assert np.abs(np.asarray(d_b1) - np.asarray(d_init)).max() > 1e-4


def test_finetune_trainer_transition_and_trust_loss(tmp_path):
    """Full trainer with field_focal_mode=finetune: at the transition the
    block tables become copies of the trained global; focal steps then
    fine-tune them away from it; trust_loss shows in the metrics."""
    from gfnerf_tpu.configs.method_configs import gf_nerf_tiny_config
    from gfnerf_tpu.data.dataparsers.minimal_parser import (
        MinimalDataParser, MinimalDataParserConfig)
    from gfnerf_tpu.engine.trainer import Trainer
    from gfnerf_tpu.utils.synthetic import make_synthetic_npz

    path = tmp_path / "scene"
    make_synthetic_npz(path, n_train=12, n_val=2, img_wh=(32, 24))
    cfg = gf_nerf_tiny_config()
    cfg.max_num_iterations = 16
    cfg.output_dir = tmp_path / "out"
    cfg.vis = "local"
    cfg.data = path
    cfg.steps_per_save = 10 ** 9
    cfg.steps_per_eval_batch = 10 ** 9
    cfg.pipeline.datamanager.train_num_rays_per_batch = 128
    cfg.pipeline.model.s3im_patch_height = 8
    cfg.pipeline.field_focal_mode = "finetune"
    cfg.pipeline.model.finetune_trust_mult = 1.0

    parser = MinimalDataParser(MinimalDataParserConfig(data=path))
    trainer = Trainer(cfg, parser)
    trainer.setup()
    p = trainer.pipeline
    assert p.field_cfg.focal_mode == "finetune"
    # finetune tables share the global hash function
    np.testing.assert_array_equal(
        np.asarray(p.statics.block_prims[0]),
        np.asarray(p.statics.global_prim))
    trainer.train()

    g = np.asarray(p.state.params.global_feat)
    bf = np.asarray(p.state.params.block_feats)
    # the active block fine-tuned AWAY from the copy; at tiny scale at
    # least one block trained (split 0 and 1 both activate in 6 steps)
    assert any(np.abs(bf[b] - g).max() > 0 for b in range(2))
    # but stayed in the trust region's neighborhood (sanity: finite, and
    # not wildly far given 6 low-lr steps)
    assert np.isfinite(bf).all()
    m = p.get_train_loss_dict(15)
    p.after_train_iteration(15)
    assert "trust_loss" in m and np.isfinite(m["trust_loss"])
    # eval still works end-to-end
    metrics, _ = p.get_eval_image_metrics_and_images(step=16, idx=0)
    assert np.isfinite(metrics["psnr"])
