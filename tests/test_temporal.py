"""Temporal grid (N9) + NeRFPlayer model tests."""

import jax
import jax.numpy as jnp
import numpy as np

from gfnerf_tpu.fields.temporal_grid import (
    make_temporal_grid,
    temporal_grid_encode,
    temporal_tv_loss,
)


def _numpy_encode_one(emb, st, xyz, t):
    """Independent scalar-path reference for one point."""
    C = st.level_dim
    T = st.temporal_dim
    val = min(max(t, 0.0), 1.0) * max(T - 2, 1)
    row = min(int(val), max(T - 1, 1) - 1)
    ft = val - row
    out = []
    for l, res in enumerate(st.resolutions):
        off = int(st.offsets[l])
        n_level = int(st.offsets[l + 1] - off)
        pos = xyz * res
        cell = np.floor(pos).astype(int)
        frac = pos - np.floor(pos)
        acc = np.zeros(C)
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    cx, cy, cz = (min(cell[0] + dx, res),
                                  min(cell[1] + dy, res),
                                  min(cell[2] + dz, res))
                    if st.hashed[l]:
                        idx = ((np.uint32(cx) * np.uint32(1))
                               ^ (np.uint32(cy) * np.uint32(2654435761))
                               ^ (np.uint32(cz) * np.uint32(805459861)))
                        idx = int(idx % np.uint32(n_level))
                    else:
                        idx = cx + (res + 1) * (cy + (res + 1) * cz)
                    w = ((frac[0] if dx else 1 - frac[0])
                         * (frac[1] if dy else 1 - frac[1])
                         * (frac[2] if dz else 1 - frac[2]))
                    r = emb[off + idx]
                    feat = r[st.sel_pass[row]].copy()
                    feat[st.interp_pos[row]] = (
                        (1 - ft) * r[st.sel_old[row]]
                        + ft * r[st.sel_new[row]])
                    acc += w * feat
        out.append(acc)
    return np.concatenate(out)


def test_window_tables():
    _, st = make_temporal_grid(seed=0, temporal_dim=5, num_levels=2,
                               level_dim=2, base_resolution=4,
                               log2_hashmap_size=8)
    # rows: (interp 0->2, pass 1), (pass 2, interp 1->3), (interp 2->4, pass 3), ...
    assert st.sel_old.tolist() == [0, 1, 2, 3]
    assert st.sel_new.tolist() == [2, 3, 4, 5]
    assert st.interp_pos.tolist() == [0, 1, 0, 1]
    assert st.sel_pass[0].tolist() == [0, 1]
    assert st.sel_pass[1].tolist() == [2, 1]
    assert st.sel_pass[2].tolist() == [2, 3]
    # consecutive windows differ in exactly one channel
    prev = {0, 1}
    for r in range(4):
        cur = set(st.sel_pass[r].tolist())
        cur.discard(st.sel_old[r])
        cur.add(st.sel_new[r])
        assert len(prev.symmetric_difference(
            set(st.sel_pass[r].tolist()))) <= 2
        prev = cur


def test_encode_matches_numpy():
    emb, st = make_temporal_grid(seed=1, temporal_dim=6, num_levels=3,
                                 level_dim=2, base_resolution=4,
                                 log2_hashmap_size=6)
    rng = np.random.default_rng(0)
    emb_np = np.asarray(emb)
    xyz = rng.uniform(0.05, 0.95, (16, 3)).astype(np.float32)
    ts = rng.uniform(0, 1, 16).astype(np.float32)
    got = np.asarray(temporal_grid_encode(emb, st, jnp.asarray(xyz),
                                          jnp.asarray(ts)))
    want = np.stack([_numpy_encode_one(emb_np, st, xyz[i], float(ts[i]))
                     for i in range(16)])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_time_continuity():
    """Encoding must be continuous in time (the sliding-window design goal:
    adjacent windows differ in one interpolated channel)."""
    emb, st = make_temporal_grid(seed=2, temporal_dim=8, num_levels=2,
                                 level_dim=2, base_resolution=4,
                                 log2_hashmap_size=8)
    xyz = jnp.asarray(np.random.default_rng(3).uniform(0.1, 0.9, (4, 3)),
                      jnp.float32)
    ts = np.linspace(0, 1, 97)
    outs = [np.asarray(temporal_grid_encode(
        emb, st, xyz, jnp.full((4,), t, jnp.float32))) for t in ts]
    deltas = [np.abs(outs[i + 1] - outs[i]).max() for i in range(96)]
    assert max(deltas) < 5e-5   # emb scale 1e-4; jumps would be ~1e-4


def test_tv_loss_and_grads():
    emb, st = make_temporal_grid(seed=4, temporal_dim=6, num_levels=2,
                                 level_dim=2, base_resolution=4,
                                 log2_hashmap_size=8)
    tv = temporal_tv_loss(emb, st, jax.random.PRNGKey(0))
    assert np.isfinite(float(tv))
    g = jax.grad(lambda e: jnp.sum(temporal_grid_encode(
        e, st, jnp.full((8, 3), 0.4), jnp.full((8,), 0.3)) ** 2))(emb)
    assert float(jnp.abs(g).max()) > 0


def test_nerfplayer_models_forward():
    from gfnerf_tpu.models.nerfplayer import (
        NerfplayerConfig, NerfplayerNGPConfig, init_nerfplayer_params,
        init_nerfplayer_ngp_params, nerfplayer_loss, nerfplayer_ngp_loss,
        update_ngp_occupancy)

    rng = jax.random.PRNGKey(0)
    r = 16
    o = jnp.zeros((r, 3)) + jnp.asarray([0.0, 0.0, 2.0])
    d = jax.random.normal(rng, (r, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    rel = jnp.zeros((r,), jnp.int32)
    tgt = jax.random.uniform(rng, (r, 3))
    times = np.linspace(0, 1, 4).astype(np.float32)

    cfg = NerfplayerConfig(num_proposal_samples=(32,), num_nerf_samples=16,
                           num_levels=4, log2_hashmap_size=10,
                           prop_num_levels=3, prop_log2_hashmap_size=9,
                           temporal_dim=6, prop_temporal_dim=4,
                           num_images=4)
    params, statics = init_nerfplayer_params(cfg, seed=0,
                                             camera_times=times)
    total, (losses, out) = nerfplayer_loss(params, statics, cfg, rng,
                                           o, d, rel, tgt)
    assert np.isfinite(float(total))
    assert "temporal_tv_loss" in losses
    assert out["rgb"].shape == (r, 3)
    # time conditioning reaches the output
    s0 = statics | {"camera_times": jnp.zeros((4,), jnp.float32)}
    s1 = statics | {"camera_times": jnp.ones((4,), jnp.float32)}
    from gfnerf_tpu.models.nerfplayer import nerfplayer_forward
    o0 = nerfplayer_forward(params, s0, cfg, rng, o, d, rel, train=False)
    o1 = nerfplayer_forward(params, s1, cfg, rng, o, d, rel, train=False)
    assert float(jnp.abs(o0["rgb"] - o1["rgb"]).max()) > 0

    ncfg = NerfplayerNGPConfig(num_samples=32, num_levels=4,
                               log2_hashmap_size=10, temporal_dim=6,
                               grid_resolution=16, num_images=4)
    p2, s2, ms2 = init_nerfplayer_ngp_params(ncfg, seed=0,
                                             camera_times=times)
    ms2 = update_ngp_occupancy(p2, s2, ms2, ncfg, rng)
    total2, (l2, out2) = nerfplayer_ngp_loss(p2, s2, ms2, ncfg, rng,
                                             o, d, rel, tgt)
    assert np.isfinite(float(total2))
    assert out2["rgb"].shape == (r, 3)


def test_registered_methods():
    from gfnerf_tpu.configs.method_configs import discover_methods

    methods = discover_methods()
    assert "nerfplayer-nerfacto" in methods
    assert "nerfplayer-ngp" in methods
    cfg = methods["nerfplayer-nerfacto"]()
    assert cfg.pipeline.model_kind == "nerfplayer-nerfacto"


def test_semantic_nerfw_forward_and_loss():
    import jax
    import jax.numpy as jnp

    from gfnerf_tpu.models.semantic_nerfw import (
        SemanticNerfWConfig, init_semantic_nerfw_params, semantic_nerfw_loss)

    cfg = SemanticNerfWConfig(num_proposal_samples=(32,), num_nerf_samples=16,
                              num_levels=4, log2_hashmap_size=10,
                              proposal_num_levels=3,
                              proposal_log2_hashmap_size=9,
                              num_semantic_classes=3, num_images=2)
    params, statics = init_semantic_nerfw_params(cfg, seed=0)
    rng = jax.random.PRNGKey(0)
    r = 16
    o = jnp.zeros((r, 3)) + jnp.asarray([0.0, 0.0, 2.0])
    d = jax.random.normal(rng, (r, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    rel = jnp.zeros((r,), jnp.int32)
    tgt = jax.random.uniform(rng, (r, 3))
    labels = jnp.asarray(np.random.default_rng(0).integers(0, 3, r))
    total, (losses, out) = semantic_nerfw_loss(
        params, statics, cfg, rng, o, d, rel, tgt, semantics=labels)
    assert np.isfinite(float(total))
    assert "semantics_loss" in losses
    assert out["semantics"].shape == (r, 3)
    # CE gradient reaches the semantic head but NOT the field geo
    # (pass_semantic_gradients=False)
    g = jax.grad(lambda p: semantic_nerfw_loss(
        p, statics, cfg, rng, o, d, rel, tgt, semantics=labels)[0])(params)
    assert float(jnp.abs(g["semantics_head"]["w"][0]).max()) > 0


def test_semantic_nerfw_registered():
    from gfnerf_tpu.configs.method_configs import discover_methods

    assert "semantic-nerfw" in discover_methods()
