"""The reference-default 10-block configuration, end-to-end (VERDICT r4 #5).

The reference defaults to N_BLOCKS=10 / N_SPLIT_DATASET=10
(/root/reference/gfnerf/config.py:43-44); every test elsewhere in this repo
uses n_blocks=2.  These tests pin the double-digit block count: camera
clustering into 10 equal clusters, an optimizer swap at each of the 10 split
activations, per-split error-map routing, eval routing across all 10 blocks,
and the concurrent-block shard_map step with blocks_per_shard > 1.
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def synthetic_dataset(tmp_path_factory):
    from gfnerf_tpu.utils.synthetic import make_synthetic_npz

    path = tmp_path_factory.mktemp("scene10")
    # 20 cameras -> 10 clusters of 2 (equal-size clustering)
    make_synthetic_npz(path, n_train=20, n_val=4, img_wh=(32, 24))
    return path


def _ten_block_config(dataset, out_dir):
    from gfnerf_tpu.configs.method_configs import gf_nerf_tiny_config

    cfg = gf_nerf_tiny_config()
    cfg.output_dir = out_dir
    cfg.vis = "local"
    cfg.data = dataset
    cfg.steps_per_save = 10 ** 9
    cfg.steps_per_eval_batch = 10 ** 9
    p = cfg.pipeline
    p.datamanager.train_num_rays_per_batch = 128
    p.model.s3im_patch_height = 8
    for c in (p.datamanager, p.model, p.optimizers):
        c.n_split_dataset = 10
        c.steps_per_split_dataset = 2
        c.steps_perssampler_init = 6
    p.model.n_blocks = 10
    p.sampler.sub_div_milestones = (3,)
    p.sampler.compact_freq = 10 ** 9
    p.sampler.ray_march_fineness_decay_end_iter = 6
    # init 6 steps + 10 splits x 2 steps = 26
    cfg.max_num_iterations = 26
    return cfg


def test_ten_block_schedule_end_to_end(synthetic_dataset, tmp_path):
    """Sequential focal path with the reference-default block count: every
    split activates once, swaps the optimizer, routes its own error maps,
    and trains its own residual table."""
    from gfnerf_tpu.data.dataparsers.minimal_parser import (
        MinimalDataParser, MinimalDataParserConfig)
    from gfnerf_tpu.engine.trainer import Trainer

    cfg = _ten_block_config(synthetic_dataset, tmp_path / "outputs")
    parser = MinimalDataParser(MinimalDataParserConfig(data=synthetic_dataset))
    trainer = Trainer(cfg, parser)
    trainer.setup()
    p = trainer.pipeline
    before = np.asarray(p.state.params.block_feats).copy()
    assert before.shape[0] == 10

    # record the split activations the schedule hits
    seen_splits = set()
    orig_after = p.after_train_iteration

    def spy_after(step):
        orig_after(step)
        if p.stage_of(step) == 1:  # STAGE_BLOCK
            seen_splits.add(p.sampler.cur_split_idx(step))

    p.after_train_iteration = spy_after
    trainer.train()

    # clustering produced 10 equal clusters covering all labels
    labels = np.asarray(p.sampler.cameras_labels)
    assert set(labels.tolist()) == set(range(10))
    counts = np.bincount(labels, minlength=10)
    assert counts.min() >= 1 and counts.max() <= 3, counts

    # all 10 splits activated across the schedule
    assert seen_splits == set(range(10)), seen_splits

    # every block's residual table trained during its split
    after = np.asarray(p.state.params.block_feats)
    trained = [bool(np.abs(after[b] - before[b]).max() > 0)
               for b in range(10)]
    assert all(trained), trained

    # eval routing picks per-image blocks; multiple distinct blocks are hit
    routed = set()
    for idx in range(4):
        m, _ = p.get_eval_image_metrics_and_images(step=26, idx=idx)
        assert np.isfinite(m["psnr"])
        cam = p.datamanager.eval_dataset.cameras.camera_to_worlds[idx, :3, 3]
        train_pos = p.datamanager.train_dataset.cameras.camera_to_worlds[
            :, :3, 3]
        nearest = int(np.argmin(np.linalg.norm(train_pos - cam, axis=-1)))
        routed.add(int(labels[nearest]))
    assert len(routed) >= 2, routed


def test_parallel_block_step_ten_blocks_bps5():
    """Concurrent focal step at n_blocks=10 on the (data=4, block=2) mesh:
    blocks_per_shard=5 — the block axis actually folds (every earlier test
    ran bps=1)."""
    import jax
    import jax.numpy as jnp
    import optax

    import __graft_entry__ as ge
    from gfnerf_tpu.data.dataparsers.base import CamerasHost
    from gfnerf_tpu.parallel.sharding import (make_mesh,
                                              make_parallel_block_step,
                                              shard_params)

    mesh = make_mesh(4, 2)
    (c2w, intri, tree, oct_dev, scfg, fcfg, mcfg, params,
     statics) = ge._tiny_setup(n_blocks=10)
    n_cams = len(c2w)
    params, statics = shard_params(mesh, params, statics)

    tx_block = optax.chain(optax.scale_by_adam(eps=1e-15), optax.scale(-5e-3))
    opt_blocks = jax.vmap(tx_block.init)(params.block_feats)
    pb_step = make_parallel_block_step(fcfg, mcfg, scfg, tx_block, mesh)

    cams_host = CamerasHost(
        camera_to_worlds=c2w, fx=intri[:, 0, 0], fy=intri[:, 1, 1],
        cx=intri[:, 0, 2], cy=intri[:, 1, 2],
        width=np.full(n_cams, 32, np.int32),
        height=np.full(n_cams, 24, np.int32))
    cameras = cams_host.to_device()

    r_total = 16 * 8
    rng = np.random.default_rng(0)
    batch = {
        "camera_indices": jnp.asarray(rng.integers(0, n_cams, r_total),
                                      jnp.int32),
        "rel_camera_indices": jnp.asarray(rng.integers(0, n_cams, r_total),
                                          jnp.int32),
        "coords": jnp.asarray(np.stack([rng.uniform(0, 24, r_total),
                                        rng.uniform(0, 32, r_total)], -1),
                              jnp.float32),
        "image": jnp.asarray(rng.random((r_total, 3)), jnp.float32),
    }
    frozen = params.replace(block_feats=None)
    # Phase p trains local table (p % 5) in each of the 2 shard groups:
    # shard 0 holds blocks 0-4, shard 1 holds 5-9 -> phase p trains blocks
    # {p, p+5}.  Run all 5 phases and check the rotation covers all 10.
    before = np.asarray(params.block_feats)
    bf, ob = params.block_feats, opt_blocks
    for phase in range(5):
        prev = np.asarray(bf)
        bf, ob, losses, errs = pb_step(
            bf, statics.block_prims, statics.block_biases,
            ob, frozen, statics, oct_dev, cameras, batch,
            jnp.asarray(1.0), jnp.asarray(phase, jnp.int32),
            jax.random.PRNGKey(phase))
        assert losses.shape == (2,)  # one pmean'd loss per shard group
        assert np.all(np.isfinite(np.asarray(losses)))
        cur = np.asarray(bf)
        for b in range(10):
            moved = np.abs(cur[b] - prev[b]).max() > 0
            expect = b % 5 == phase
            assert moved == expect, (
                f"phase {phase}: block {b} moved={moved}, expected={expect}")
    after = np.asarray(bf)
    for b in range(10):
        assert np.abs(after[b] - before[b]).max() > 0, f"block {b} froze"
    np.testing.assert_array_equal(np.asarray(frozen.global_feat),
                                  np.asarray(params.global_feat))
