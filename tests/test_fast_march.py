"""Fast (leaf-list) march vs the sequential scan march: behavioral parity."""

import numpy as np
import jax.numpy as jnp

from gfnerf_tpu.sampler.fast_march import get_samples_fast
from gfnerf_tpu.sampler.perssampler import (
    SamplerConfig,
    get_samples,
    octree_to_device,
)
from tests.test_octree import build_test_tree, make_bounds


def setup(ring_cameras, max_samples=128):
    tree = build_test_tree(ring_cameras)
    oct_dev = octree_to_device(tree, capacity=4096)
    c2w, intri = ring_cameras
    rays_o = jnp.asarray(c2w[:, :3, 3])
    rays_d = jnp.asarray(-c2w[:, :3, 2])
    return tree, oct_dev, rays_o, rays_d


def test_fast_march_basic_invariants(ring_cameras):
    tree, oct_dev, rays_o, rays_d = setup(ring_cameras)
    cfg = SamplerConfig(max_samples=128, sample_l=1.0 / 32, max_hits=32,
                        ray_chunk=len(ring_cameras[0]))
    noise = jnp.ones((rays_o.shape[0], cfg.max_samples))
    s = get_samples_fast(oct_dev, rays_o, rays_d, noise, jnp.asarray(1.0), cfg)

    valid = np.asarray(s.valid)
    assert valid.any()
    ts = np.asarray(s.ts)
    tr = np.asarray(s.trans_idx)
    # valid anchors, positive deltas, t within bounds, inside root cube
    assert (tr[valid] >= 0).all()
    assert (np.asarray(s.dists)[valid] > 0).all()
    wp = np.asarray(s.world_pts)
    assert np.abs(wp[valid]).max() <= tree.side_lens[0] / 2 + 1e-3
    # t increasing per ray
    for r in range(valid.shape[0]):
        tv = ts[r][valid[r]]
        assert (np.diff(tv) > -1e-5).all()
    # every valid sample's position actually lies inside the leaf it claims
    oi = np.asarray(s.oct_idx)
    for r in range(valid.shape[0]):
        for c in np.where(valid[r])[0][:10]:
            node = oi[r, c]
            rel = np.abs(wp[r, c] - tree.centers[node])
            assert rel.max() <= tree.side_lens[node] / 2 * (1 + 1e-3)


def test_fast_march_covers_same_leaves_as_scan(ring_cameras):
    """Both marchers should traverse the same set of leaves per ray."""
    tree, oct_dev, rays_o, rays_d = setup(ring_cameras)
    cfg = SamplerConfig(max_samples=256, sample_l=1.0 / 32, max_hits=32,
                        ray_chunk=len(ring_cameras[0]))
    noise = jnp.ones((rays_o.shape[0], cfg.max_samples))
    fast = get_samples_fast(oct_dev, rays_o, rays_d, noise,
                            jnp.asarray(1.0), cfg)
    scan = get_samples(oct_dev, rays_o, rays_d, noise, cfg)

    fv = np.asarray(fast.valid)
    sv = np.asarray(scan.valid)
    fts = np.asarray(fast.ts)
    sts = np.asarray(scan.ts)
    for r in range(rays_o.shape[0]):
        if not sv[r].any():
            continue
        # similar sample counts and t coverage (exact leaf ids can differ
        # for boundary-grazing rays — both sides are correct)
        nf, ns = fv[r].sum(), sv[r].sum()
        assert nf >= 0.6 * ns, (r, nf, ns)
        t_f = fts[r][fv[r]]
        t_s = sts[r][sv[r]]
        assert abs(t_f.min() - t_s.min()) < 0.2
        assert abs(t_f.max() - t_s.max()) < 0.5

    # first-hit distances agree
    f_fod = np.asarray(fast.first_oct_dis)
    s_fod = np.asarray(scan.first_oct_dis)
    both = (f_fod < 1e8) & (s_fod < 1e8)
    np.testing.assert_allclose(f_fod[both], s_fod[both], rtol=1e-3, atol=1e-3)


def test_fast_march_sample_spacing(ring_cameras):
    """Within a leaf, eval-mode (noise=1) spacing matches the entry-point
    Jacobian step."""
    tree, oct_dev, rays_o, rays_d = setup(ring_cameras)
    cfg = SamplerConfig(max_samples=128, sample_l=1.0 / 32, max_hits=32,
                        ray_chunk=len(ring_cameras[0]))
    noise = jnp.ones((rays_o.shape[0], cfg.max_samples))
    s = get_samples_fast(oct_dev, rays_o, rays_d, noise, jnp.asarray(1.0), cfg)
    valid = np.asarray(s.valid)
    ts = np.asarray(s.ts)
    oi = np.asarray(s.oct_idx)
    r = int(np.argmax(valid.sum(axis=1)))
    cols = np.where(valid[r])[0]
    # consecutive samples in the same leaf have constant spacing
    same = (oi[r, cols[:-1]] == oi[r, cols[1:]])
    dt = np.diff(ts[r, cols])
    runs = np.split(dt[same], np.where(np.diff(np.where(same)[0]) > 1)[0] + 1)
    for run in runs:
        if len(run) > 1:
            np.testing.assert_allclose(run, run[0], rtol=1e-3)


def test_hierarchical_march_matches_brute_force(ring_cameras):
    """With a generous coarse budget the tree-cut march must reproduce the
    brute-force leaf march exactly (same leaf set -> same lattice)."""
    tree, oct_dev, rays_o, rays_d = setup(ring_cameras)
    base = dict(max_samples=128, sample_l=1.0 / 32, max_hits=32,
                ray_chunk=len(ring_cameras[0]))
    noise = jnp.ones((rays_o.shape[0], 128))
    brute = get_samples_fast(oct_dev, rays_o, rays_d, noise,
                             jnp.asarray(1.0), SamplerConfig(**base))
    # coarse_hits = full cut size: no ray can lose a cut node
    m = int(oct_dev.cut_nodes.shape[0])
    hier = get_samples_fast(oct_dev, rays_o, rays_d, noise,
                            jnp.asarray(1.0),
                            SamplerConfig(coarse_hits=m, **base))
    assert np.array_equal(np.asarray(brute.valid), np.asarray(hier.valid))
    v = np.asarray(brute.valid)
    for name in ("ts", "dists", "world_pts", "trans_idx", "oct_idx",
                 "block_idx"):
        a, b = np.asarray(getattr(brute, name)), np.asarray(
            getattr(hier, name))
        assert np.allclose(a[v], b[v], atol=1e-5), name
    assert np.allclose(np.asarray(brute.first_oct_dis),
                       np.asarray(hier.first_oct_dis), atol=1e-5)


def test_tree_cut_covers_every_leaf_once(ring_cameras):
    """Every valid leaf appears in exactly one cut node's list."""
    from gfnerf_tpu.sampler.perssampler import build_tree_cut

    tree, oct_dev, _, _ = setup(ring_cameras)
    leaf_idx = np.asarray(oct_dev.leaf_idx)
    cut_nodes, cut_slots = build_tree_cut(tree, leaf_idx)
    n_leaves = int(oct_dev.n_leaves)
    slots = cut_slots[cut_slots >= 0]
    assert len(slots) == n_leaves
    assert len(np.unique(slots)) == n_leaves
    # each cut node is an ancestor-or-self of its leaves
    for i, node in enumerate(cut_nodes):
        if node < 0:
            continue
        for s in cut_slots[i][cut_slots[i] >= 0]:
            leaf = leaf_idx[s]
            p = leaf
            while p != node and p >= 0:
                p = tree.parents[p]
            assert p == node


def test_warp_points_has_no_structured_warp_temps():
    """Regression guard for the midscale HBM OOM (r3): the old warp_points
    gathered structured (P, 12, 2, 4) rows whose T(4, 128) tiling padded
    10.7x — 12 GB of HLO temps at the 3.1M-point midscale shape.  The flat
    w2xz_flat layout must keep every warp intermediate 2-D with a
    128-friendly minor dim."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gfnerf_tpu.sampler.perssampler import warp_points
    from gfnerf_tpu.sampler.octree import build_octree
    from gfnerf_tpu.sampler.perssampler import octree_to_device
    from tests.conftest import make_ring_cameras

    c2w, intri = make_ring_cameras(6, img_wh=(32, 24))
    bounds = np.tile(np.array([[0.01, 50.0]], np.float32), (6, 1))
    tree = build_octree(c2w, intri, bounds, max_depth=5, bbox_levels=3,
                        n_rand_pts=512, vis_res_w=16, seed=0)
    oct_dev = octree_to_device(tree, capacity=2048)

    P = 1000
    jaxpr = jax.make_jaxpr(
        lambda t, p: warp_points(oct_dev, t, p))(
        jnp.zeros((P,), jnp.int32), jnp.zeros((P, 3), jnp.float32))

    def shapes(jp):
        for eqn in jp.eqns:
            for v in eqn.outvars:
                if hasattr(v, "aval") and hasattr(v.aval, "shape"):
                    yield v.aval.shape
            for sub in eqn.params.values():
                if hasattr(sub, "jaxpr"):
                    yield from shapes(sub.jaxpr)

    bad = [s for s in shapes(jaxpr.jaxpr)
           if len(s) >= 3 and s[0] == P and s[-1] <= 8 and s[-2] <= 16]
    assert not bad, f"narrow structured per-point temps reappeared: {bad}"
