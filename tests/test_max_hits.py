"""The max_hits leaf-intersection budget must never truncate silently.

VERDICT r2 weak 4: the fast march's top-k over leaf entry distances drops
the farthest leaves when a ray crosses more than max_hits leaves — the
reference marches up to 1024 intersections/ray (PersSampler_cuda.cu:7-9).
These tests pin (a) the per-ray hit counter that makes truncation
observable, (b) that a too-small budget really does clip far coverage,
and (c) that the manager auto-grows the budget to the scene.
"""

import numpy as np
import jax.numpy as jnp

from gfnerf_tpu.sampler.fast_march import get_samples_fast
from gfnerf_tpu.sampler.perssampler import SamplerConfig, octree_to_device
from tests.test_fast_march import setup


def _slab_hit_counts(tree, o, d, global_near=0.01):
    sel = tree.is_leaf & (tree.trans_idx >= 0)
    lc = tree.centers[sel].astype(np.float32)
    ls = tree.side_lens[sel].astype(np.float32)
    lo, hi = lc - ls[:, None] / 2, lc + ls[:, None] / 2
    o = o.astype(np.float32)
    d = d.astype(np.float32)
    inv = np.float32(1.0) / np.where(np.abs(d) < 1e-10,
                                     np.where(d >= 0, 1e-10, -1e-10),
                                     d).astype(np.float32)
    t0 = (lo[None] - o[:, None]) * inv[:, None]
    t1 = (hi[None] - o[:, None]) * inv[:, None]
    near = np.maximum(np.max(np.minimum(t0, t1), -1), global_near)
    far = np.min(np.maximum(t0, t1), -1)
    return (far > near).sum(axis=1)


def test_num_hits_counts_all_leaf_intersections(ring_cameras):
    tree, oct_dev, rays_o, rays_d = setup(ring_cameras)
    cfg = SamplerConfig(max_samples=128, sample_l=1.0 / 32, max_hits=4,
                        ray_chunk=len(ring_cameras[0]))
    noise = jnp.ones((rays_o.shape[0], cfg.max_samples))
    s = get_samples_fast(oct_dev, rays_o, rays_d, noise, jnp.asarray(1.0),
                         cfg)
    o = np.asarray(rays_o)
    d = np.asarray(rays_d)
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    expect = _slab_hit_counts(tree, o, d)
    got = np.asarray(s.num_hits)
    # num_hits counts every slab intersection, independent of the top-k cap
    np.testing.assert_array_equal(got, expect)
    assert (got > cfg.max_hits).any(), "fixture must exercise truncation"


def test_small_max_hits_clips_far_coverage(ring_cameras):
    """A truncating budget loses the far end of the march; the counter
    flags exactly those rays."""
    tree, oct_dev, rays_o, rays_d = setup(ring_cameras)
    kw = dict(max_samples=256, sample_l=1.0 / 32,
              ray_chunk=len(ring_cameras[0]))
    noise = jnp.ones((rays_o.shape[0], 256))
    s_small = get_samples_fast(oct_dev, rays_o, rays_d, noise,
                               jnp.asarray(1.0),
                               SamplerConfig(max_hits=4, **kw))
    s_big = get_samples_fast(oct_dev, rays_o, rays_d, noise,
                             jnp.asarray(1.0),
                             SamplerConfig(max_hits=64, **kw))
    trunc = np.asarray(s_small.num_hits) > 4
    assert trunc.any()
    ts_s = np.where(np.asarray(s_small.valid), np.asarray(s_small.ts), 0.0)
    ts_b = np.where(np.asarray(s_big.valid), np.asarray(s_big.ts), 0.0)
    # on truncated rays the small budget's farthest sample falls short
    short = ts_s.max(axis=1) < ts_b.max(axis=1) - 1e-4
    assert short[trunc].any()
    # and untruncated rays are unaffected by the budget
    np.testing.assert_allclose(ts_s[~trunc], ts_b[~trunc], atol=1e-5)


def test_manager_auto_grows_max_hits(ring_cameras):
    from gfnerf_tpu.sampler.manager import (
        PersSamplerManager,
        PersSamplerManagerConfig,
    )
    from tests.test_octree import make_bounds

    c2w, intri = ring_cameras
    cfg = PersSamplerManagerConfig(
        bbox_levels=4, max_level=6, n_rand_pts=512, vis_res_w=32,
        max_samples=128, sample_l=1.0 / 32, auto_sample_l=False,
        max_hits=4)
    mgr = PersSamplerManager(c2w, intri, make_bounds(len(c2w)), cfg,
                             n_split_dataset=2, steps_per_split_dataset=10,
                             steps_perssampler_init=10)
    h = mgr.sampler_config.max_hits
    assert h > 4 and h <= 1024 and (h & (h - 1)) == 0
    # grown budget covers the trial maximum with headroom
    assert h >= mgr._count_leaf_hits().max()
