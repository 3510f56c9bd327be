"""Octree builder + device sampler behavior tests (synthetic ring scene)."""

import numpy as np
import jax.numpy as jnp

from gfnerf_tpu.sampler.octree import (
    build_octree,
    distance_summary,
    proc_octree,
    update_block_idxs,
)
from gfnerf_tpu.sampler.perssampler import (
    SamplerConfig,
    get_samples,
    locate_points,
    octree_to_device,
    update_oct_nodes,
    warp_points,
)


def make_bounds(n, near=0.01, far=20.0):
    b = np.zeros((n, 2), np.float32)
    b[:, 0] = near
    b[:, 1] = far
    return b


def build_test_tree(ring_cameras, max_depth=6, bbox_levels=4):
    c2w, intri = ring_cameras
    bounds = make_bounds(len(c2w))
    return build_octree(
        c2w, intri, bounds,
        max_depth=max_depth, bbox_levels=bbox_levels, seed=0,
        n_rand_pts=512, vis_res_w=32,
    )


def test_distance_summary_matches_reference_def():
    d = np.array([1.0, 2.0, 3.0, 4.0, 8.0])
    log = np.log(d)
    thres = np.quantile(log, 0.25)
    mask = log < thres
    want = np.exp((log * mask).sum() / mask.sum())
    assert abs(distance_summary(d) - want) < 1e-6
    assert distance_summary(np.zeros((0,))) == 1e8


def test_build_octree_basic(ring_cameras):
    tree = build_test_tree(ring_cameras)
    assert tree.n_nodes > 1
    assert (tree.trans_idx >= 0).sum() > 0, "no valid leaves"
    # invariants: internal nodes have trans -1; children indices consistent
    for u in range(tree.n_nodes):
        if not tree.is_leaf[u]:
            assert tree.trans_idx[u] == -1
            for st in range(8):
                v = tree.childs[u, st]
                if v >= 0:
                    assert tree.parents[v] == u
                    np.testing.assert_allclose(
                        tree.side_lens[v], tree.side_lens[u] * 0.5
                    )
    # warp tensors finite
    assert np.isfinite(tree.w2xz).all()
    assert np.isfinite(tree.weight).all()


def test_warp_is_roughly_normalized(ring_cameras):
    """Warped coords of in-leaf points should be bounded (the field maps
    (p+1.5)/3 into [0,1], reference nerfacto_field.py:431)."""
    tree = build_test_tree(ring_cameras)
    oct = octree_to_device(tree, capacity=4096)
    valid = np.where(tree.trans_idx >= 0)[0]
    rng = np.random.default_rng(0)
    pts, trs = [], []
    for u in valid[:10]:
        p = (rng.random((64, 3)).astype(np.float32) - 0.5) * tree.side_lens[u] \
            + tree.centers[u]
        pts.append(p)
        trs.append(np.full(64, tree.trans_idx[u], np.int32))
    pts = np.concatenate(pts)
    trs = np.concatenate(trs)
    warped = np.asarray(warp_points(oct, jnp.asarray(trs), jnp.asarray(pts)))
    assert np.isfinite(warped).all()
    assert np.abs(warped).max() < 20.0


def test_locate_points(ring_cameras):
    tree = build_test_tree(ring_cameras)
    oct = octree_to_device(tree, capacity=4096)
    valid = np.where(tree.trans_idx >= 0)[0]
    # points strictly inside valid leaves must locate to them
    centers = tree.centers[valid[:20]]
    u, c, s, trans, block = locate_points(oct, jnp.asarray(centers), 24)
    np.testing.assert_array_equal(np.asarray(u), valid[:20])
    np.testing.assert_array_equal(np.asarray(trans), tree.trans_idx[valid[:20]])


def test_get_samples_march(ring_cameras):
    c2w, intri = ring_cameras
    tree = build_test_tree(ring_cameras)
    oct = octree_to_device(tree, capacity=4096)
    cfg = SamplerConfig(max_samples=128, sample_l=1.0 / 32)

    # rays from the cameras toward the scene center
    rays_o = jnp.asarray(c2w[:, :3, 3])
    rays_d = jnp.asarray(c2w[:, :3, 2] * -1.0)  # forward = -z
    noise = jnp.ones((len(c2w), cfg.max_samples))
    s = get_samples(oct, rays_o, rays_d, noise, cfg)

    valid = np.asarray(s.valid)
    assert valid.any(), "no samples emitted"
    ts = np.asarray(s.ts)
    # t strictly increasing within each ray's valid samples
    for r in range(valid.shape[0]):
        tv = ts[r][valid[r]]
        assert (np.diff(tv) > 0).all()
    # all valid samples have valid anchors and are inside the root cube
    tr = np.asarray(s.trans_idx)
    assert (tr[valid] >= 0).all()
    wp = np.asarray(s.world_pts)
    root_half = tree.side_lens[0] / 2 + 1e-3
    assert (np.abs(wp[valid]).max() <= root_half)
    # first_oct_dis is finite for rays that hit
    fod = np.asarray(s.first_oct_dis)
    hit = valid.any(axis=1)
    assert (fod[hit] < 1e8).all()
    # deltas positive
    assert (np.asarray(s.dists)[valid] > 0).all()


def test_update_oct_nodes_and_rebuild(ring_cameras):
    c2w, intri = ring_cameras
    tree = build_test_tree(ring_cameras)
    oct = octree_to_device(tree, capacity=8192)
    cfg = SamplerConfig(max_samples=64, sample_l=1.0 / 16)
    rays_o = jnp.asarray(c2w[:, :3, 3])
    rays_d = jnp.asarray(-c2w[:, :3, 2])
    noise = jnp.ones((len(c2w), cfg.max_samples))
    s = get_samples(oct, rays_o, rays_d, noise, cfg)

    weights = jnp.where(s.valid, 0.5, 0.0)
    alphas = jnp.where(s.valid, 0.5, 0.0)
    oct2 = update_oct_nodes(oct, s, weights, alphas)
    # high weights everywhere -> no node should have been invalidated
    n = tree.n_nodes
    assert (np.asarray(oct2.trans_idx[:n]) == tree.trans_idx).all()
    assert np.asarray(oct2.visit_cnt).max() > 0

    # weights below both the absolute and relative thresholds in one node
    # (with other samples high, so the per-ray relative bar stays at 0.01,
    # PersSampler_cuda.cu:544) -> that node's stats decay by -1 per step
    visited = np.asarray(s.oct_idx)[np.asarray(s.valid)]
    target = visited[0]
    suppress = jnp.asarray(np.asarray(s.oct_idx) == target)
    weights1 = jnp.where(suppress, 1e-9, weights)
    oct3 = oct
    for _ in range(5):
        oct3 = update_oct_nodes(oct3, s, weights1, weights1)
    assert int(oct3.weight_stats[int(target)]) == 1000 - 5

    # host rebuild roundtrip
    from gfnerf_tpu.sampler.perssampler import octree_from_device
    t2 = octree_from_device(oct2, tree)
    t3 = proc_octree(t2, compact=True, subdivide=True, brute_force=False)
    assert t3.n_nodes >= t2.n_nodes  # visited leaves subdivided
    t4 = proc_octree(t3, compact=True, subdivide=False, brute_force=False)
    assert t4.n_nodes <= t3.n_nodes


def test_update_block_idxs(ring_cameras):
    tree = build_test_tree(ring_cameras)
    centers = np.array([[2.0, 0, 0], [-2.0, 0, 0]], np.float32)
    update_block_idxs(tree, centers)
    assert set(np.unique(tree.block_idx)) <= {0, 1}
    right = tree.centers[:, 0] > 0.5
    assert (tree.block_idx[right] == 0).all()
