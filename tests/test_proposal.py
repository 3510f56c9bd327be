"""Proposal-guided resampling tests (models/gfnerf.py proposal path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import __graft_entry__ as ge
from gfnerf_tpu.fields.field import (
    STAGE_BLOCK,
    STAGE_INIT,
    FieldConfig,
    init_field_params,
    proposal_density,
)
from gfnerf_tpu.models.gfnerf import (
    GFNeRFModelConfig,
    TrainState,
    make_train_step,
    model_forward,
    sample_rays,
)


@pytest.fixture(scope="module")
def setup():
    from gfnerf_tpu.sampler.octree import build_octree
    from gfnerf_tpu.sampler.perssampler import SamplerConfig, octree_to_device
    from gfnerf_tpu.utils.synthetic import ring_cameras

    c2w, fx, fy, cx, cy, w, h = ring_cameras(12, img_wh=(32, 24))
    intri = np.zeros((12, 3, 3), np.float32)
    intri[:, 0, 0] = fx; intri[:, 1, 1] = fy
    intri[:, 0, 2] = cx; intri[:, 1, 2] = cy; intri[:, 2, 2] = 1
    bounds = np.tile(np.array([[0.01, 50.0]], np.float32), (12, 1))
    tree = build_octree(c2w, intri, bounds, max_depth=5, bbox_levels=4,
                        n_rand_pts=512, vis_res_w=16, seed=0)
    oct_dev = octree_to_device(tree, capacity=4096)
    scfg = SamplerConfig(max_samples=64, sample_l=1.0 / 64, locate_iters=8)
    fcfg = FieldConfig(num_images=12, n_volumes=tree.n_volumes, num_levels=4,
                       features_per_level=4, hash_layout="packed",
                       packed_rows_log2=10, n_blocks=2, use_proposal=True,
                       proposal_levels=3, proposal_rows_log2=9)
    mcfg = GFNeRFModelConfig(n_blocks=2, scale_factor=1.0,
                             num_proposal_resamples=16,
                             samples_budget_per_ray=64,
                             s3im_patch_height=4)
    params, statics = init_field_params(fcfg, seed=0)
    c2w_j = jnp.asarray(c2w)
    o = jnp.asarray(np.repeat(c2w[:4, :, 3], 8, axis=0))
    d = jnp.asarray(np.repeat(-c2w[:4, :, 2], 8, axis=0))
    samples = sample_rays(oct_dev, o, d, jnp.ones((32, 64)),
                          jnp.asarray(2.0), scfg)
    return (oct_dev, scfg, fcfg, mcfg, params, statics, o, d, samples, c2w,
            intri, tree)


def test_proposal_params_exist(setup):
    _, _, fcfg, _, params, statics, *_ = setup
    assert params.prop_feat is not None and params.prop_net is not None
    assert statics.prop_prim is not None
    assert params.prop_feat.shape[0] == fcfg.proposal_levels


def test_proposal_forward_finite_and_shaped(setup):
    (oct_dev, scfg, fcfg, mcfg, params, statics, o, d, samples, *_)= setup
    out = model_forward(params, statics, fcfg, mcfg, samples, d,
                        jnp.zeros((32,), jnp.int32), STAGE_INIT, 0,
                        oct_dev=oct_dev, rays_o=o,
                        rng=jax.random.PRNGKey(0))
    k = mcfg.num_proposal_resamples
    assert out["weights"].shape == (32, k)
    assert out["rgb"].shape == (32, 3)
    for key in ("rgb", "weights", "prop_weights", "depth"):
        assert np.isfinite(np.asarray(out[key])).all(), key
    # probe weights live on the marched lattice for occupancy stats
    assert out["march_weights"].shape == samples.valid.shape
    # fine bins are monotone and within the marched range
    bs, be = out["fine_spacing"]
    assert float(jnp.min(be - bs)) >= 0.0


def test_proposal_grads_flow_and_focal_freeze(setup):
    (oct_dev, scfg, fcfg, mcfg, params, statics, o, d, samples, *_)= setup

    def loss(p):
        out = model_forward(p, statics, fcfg, mcfg, samples, d,
                            jnp.zeros((32,), jnp.int32), STAGE_INIT, 0,
                            oct_dev=oct_dev, rays_o=o,
                            rng=jax.random.PRNGKey(0))
        # interlevel reaches the probe; rgb reaches the main field
        from gfnerf_tpu.model_components.losses import interlevel_loss

        pb_s, pb_e = out["prop_spacing"]
        fb_s, fb_e = out["fine_spacing"]
        return (jnp.sum(out["rgb"] ** 2)
                + interlevel_loss(out["weights"], fb_s, fb_e,
                                  out["prop_weights"], pb_s, pb_e))

    g = jax.grad(loss)(params)
    assert float(jnp.abs(g.prop_feat).max()) > 0, "probe got no gradient"
    assert float(jnp.abs(g.global_feat).max()) > 0
    # focal-stage freezing covers the probe
    from gfnerf_tpu.engine.optimizers import mask_frozen_grads

    gz = mask_frozen_grads(g, STAGE_BLOCK)
    assert float(jnp.abs(gz.prop_feat).max()) == 0.0


def test_proposal_train_step_runs(setup):
    (oct_dev, scfg, fcfg, mcfg, params, statics, o, d, samples, c2w, intri,
     tree) = setup
    import optax

    from gfnerf_tpu.data.dataparsers.base import CamerasHost
    from gfnerf_tpu.engine.optimizers import (OptimizersConfig,
                                              build_optimizer, optimizer_arg)

    tx = build_optimizer(OptimizersConfig(steps_perssampler_init=10,
                                          steps_per_split_dataset=10,
                                          n_split_dataset=2), params)
    state = TrainState(params=params,
                       opt_state=tx.init(optimizer_arg(params)),
                       step=jnp.asarray(0, jnp.int32))
    step_fn = make_train_step(fcfg, mcfg, scfg, tx, STAGE_INIT)
    n = len(c2w)
    cams = CamerasHost(camera_to_worlds=c2w,
                       fx=intri[:, 0, 0], fy=intri[:, 1, 1],
                       cx=intri[:, 0, 2], cy=intri[:, 1, 2],
                       width=np.full(n, 32, np.int32),
                       height=np.full(n, 24, np.int32)).to_device()
    rng = np.random.default_rng(0)
    batch = {
        "camera_indices": jnp.asarray(rng.integers(0, n, 32), jnp.int32),
        "rel_camera_indices": jnp.asarray(rng.integers(0, n, 32), jnp.int32),
        "coords": jnp.asarray(np.stack([rng.uniform(0, 24, 32),
                                        rng.uniform(0, 32, 32)], -1),
                              jnp.float32),
        "image": jnp.asarray(rng.random((32, 3)), jnp.float32),
    }
    state2, oct2, metrics, err = step_fn(
        state, statics, oct_dev, cams, batch, jnp.asarray(2.0),
        jnp.asarray(0, jnp.int32), jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert "interlevel_loss" in metrics
    assert np.isfinite(float(metrics["interlevel_loss"]))
