"""Two-phase early-termination renderer (models/render_early.py).

With eps=0 every ray survives phase 1 and the head+tail composition must
reproduce the single-pass ``make_render_fn`` output EXACTLY (same samples:
the lattice is marched once and split at s1; rgb/acc compose linearly in
transmittance, depth in weighted-sum space).  With a realistic eps the
dropped tails are bounded by eps, so outputs stay within eps-ish of the
single pass.
"""

import numpy as np
import pytest


def _scene(budget=0, n_blocks=2):
    import jax.numpy as jnp

    from gfnerf_tpu.fields.field import FieldConfig, init_field_params
    from gfnerf_tpu.models.gfnerf import GFNeRFModelConfig
    from gfnerf_tpu.sampler.octree import build_octree
    from gfnerf_tpu.sampler.perssampler import (SamplerConfig,
                                                octree_to_device)
    from tests.conftest import make_ring_cameras

    w, h = 32, 24
    c2w, intri = make_ring_cameras(6, img_wh=(w, h))
    bounds = np.tile(np.array([[0.01, 50.0]], np.float32), (6, 1))
    tree = build_octree(c2w, intri, bounds, max_depth=5, bbox_levels=3,
                        n_rand_pts=512, vis_res_w=16, seed=0)
    cfg = FieldConfig(num_images=6, n_volumes=tree.n_volumes, num_levels=4,
                      features_per_level=4, hash_layout="packed",
                      packed_rows_log2=8, n_blocks=n_blocks, hidden_dim=32,
                      hidden_dim_color=32)
    params, statics = init_field_params(cfg, seed=0)
    rng = np.random.default_rng(3)
    params = params.replace(
        block_feats=jnp.asarray(
            rng.uniform(-0.3, 0.3, params.block_feats.shape), jnp.float32),
        global_feat=jnp.asarray(
            rng.uniform(-0.5, 0.5, params.global_feat.shape), jnp.float32))
    oct_dev = octree_to_device(tree, capacity=4096)

    S = 64
    scfg = SamplerConfig(max_samples=S, sample_l=1.0 / 64, locate_iters=8)
    mcfg = GFNeRFModelConfig(n_blocks=n_blocks, scale_factor=1.0,
                             samples_budget_per_ray=budget,
                             s3im_loss_mult=0.0)

    R = 64
    o = np.repeat(c2w[:4, :, 3], R // 4, axis=0).astype(np.float32)
    d = -o / np.linalg.norm(o, axis=-1, keepdims=True)
    o = o + rng.normal(0, 0.05, o.shape).astype(np.float32)
    d = d + rng.normal(0, 0.08, d.shape).astype(np.float32)
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    return (cfg, mcfg, scfg, params, statics, oct_dev,
            jnp.asarray(o), jnp.asarray(d))


@pytest.mark.parametrize("stage_is_block", [False, True])
def test_early_term_eps0_matches_single_pass(stage_is_block):
    import jax.numpy as jnp

    from gfnerf_tpu.models.gfnerf import make_render_fn
    from gfnerf_tpu.models.render_early import EarlyTermRenderer

    cfg, mcfg, scfg, params, statics, oct_dev, o, d = _scene(budget=0)
    render = make_render_fn(cfg, mcfg, scfg)
    rel = jnp.zeros((o.shape[0],), jnp.int32)
    ab = jnp.asarray(0, jnp.int32)
    ref = render(params, statics, oct_dev, o, d, rel, ab, stage_is_block)

    et = EarlyTermRenderer(cfg, mcfg, scfg, s1=16, eps=0.0, min_bucket=16)
    out = et.render_chunk(params, statics, oct_dev, o, d, rel, ab,
                          stage_is_block)
    # eps=0: every ray with any transmittance left survives (a ray whose
    # float transmittance underflowed to exactly 0 may drop out — its tail
    # contribution is exactly 0, so the comparison below stays exact)
    assert et.last_survivor_frac > 0.5
    for k in ("rgb", "accumulation", "depth"):
        np.testing.assert_allclose(out[k], np.asarray(ref[k]), rtol=1e-4,
                                   atol=1e-5, err_msg=k)


def test_early_term_realistic_eps_close_and_terminates():
    import jax.numpy as jnp

    from gfnerf_tpu.models.gfnerf import make_render_fn
    from gfnerf_tpu.models.render_early import EarlyTermRenderer

    cfg, mcfg, scfg, params, statics, oct_dev, o, d = _scene(budget=0)
    # crank density so rays saturate inside the head segment
    params = params.replace(global_feat=params.global_feat * 3.0)
    render = make_render_fn(cfg, mcfg, scfg)
    rel = jnp.zeros((o.shape[0],), jnp.int32)
    ab = jnp.asarray(0, jnp.int32)
    ref = render(params, statics, oct_dev, o, d, rel, ab, False)

    eps = 5e-3
    et = EarlyTermRenderer(cfg, mcfg, scfg, s1=32, eps=eps, min_bucket=16)
    out = et.render_chunk(params, statics, oct_dev, o, d, rel, ab, False)
    # the dropped tail of a terminated ray weighs at most eps
    np.testing.assert_allclose(out["rgb"], np.asarray(ref["rgb"]),
                               atol=2 * eps)
    np.testing.assert_allclose(out["accumulation"],
                               np.asarray(ref["accumulation"]), atol=2 * eps)


def test_early_term_budget_and_per_ray_blocks_run():
    """Compacted (budget > 0) phases and (R,)-routed blocks execute and
    produce finite, plausible outputs (budget selection differs from the
    single pass by construction, so no exact-match claim)."""
    import jax.numpy as jnp

    from gfnerf_tpu.models.render_early import EarlyTermRenderer

    cfg, mcfg, scfg, params, statics, oct_dev, o, d = _scene(budget=24)
    rel = jnp.zeros((o.shape[0],), jnp.int32)
    blocks = jnp.asarray(np.arange(o.shape[0]) % 2, jnp.int32)
    et = EarlyTermRenderer(cfg, mcfg, scfg, s1=16, eps=1e-3, min_bucket=16)
    out = et.render_chunk(params, statics, oct_dev, o, d, rel, blocks, True)
    for k in ("rgb", "accumulation", "depth"):
        assert np.isfinite(out[k]).all(), k
    assert out["accumulation"].max() > 0.01
    assert 0.0 <= out["accumulation"].max() <= 1.0 + 1e-5
