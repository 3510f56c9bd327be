"""Golden tests for the anchored hash encoding vs an independent numpy
re-derivation of the reference CUDA math (Hash3DAnchored_cuda.cu:12-79)."""

import numpy as np
import jax
import jax.numpy as jnp

from gfnerf_tpu.fields.hash_encoding import (
    HashEncodingParams,
    hash_encode,
    init_hash_params,
    _level_scales,
)


def numpy_hash_encode(params, points, anchors):
    """Straight-line numpy port of the forward CUDA kernel."""
    feat = np.asarray(params.feat_pool)     # (L, local, C)
    prim = np.asarray(params.prim_pool)     # (L, V, 3)
    bias = np.asarray(params.bias_pool)     # (L, V, 3)
    L, local, C = feat.shape
    out = np.zeros((len(points), L * C), np.float32)
    scales = _level_scales(L)
    for pi, (p, vol) in enumerate(zip(points, anchors)):
        if vol < 0:
            continue
        for l in range(L):
            pt = p * scales[l] + bias[l, vol]
            pos = np.floor(pt).astype(np.int64)
            frac = pt - np.floor(pt)
            pa, pb, pc = [np.uint64(x) for x in prim[l, vol]]
            acc = np.zeros(C, np.float32)
            for k in range(8):
                dx, dy, dz = (k >> 2) & 1, (k >> 1) & 1, k & 1
                x = np.uint64(pos[0] + dx) & np.uint64(0xFFFFFFFF)
                y = np.uint64(pos[1] + dy) & np.uint64(0xFFFFFFFF)
                z = np.uint64(pos[2] + dz) & np.uint64(0xFFFFFFFF)
                h = (
                    ((x * pa) & np.uint64(0xFFFFFFFF))
                    ^ ((y * pb) & np.uint64(0xFFFFFFFF))
                    ^ ((z * pc) & np.uint64(0xFFFFFFFF))
                ) % np.uint64(local)
                wx = frac[0] if dx else 1 - frac[0]
                wy = frac[1] if dy else 1 - frac[1]
                wz = frac[2] if dz else 1 - frac[2]
                acc += (wx * wy * wz) * feat[l, int(h)]
            out[pi, l * C:(l + 1) * C] = acc
    return out


def test_hash_encode_matches_numpy_reference():
    params = init_hash_params(seed=0, log2_table_size=10, n_volumes=3)
    rng = np.random.default_rng(1)
    pts = rng.random((32, 3)).astype(np.float32)
    anchors = rng.integers(-1, 3, size=(32,)).astype(np.int32)

    got = np.asarray(hash_encode(params, jnp.asarray(pts), jnp.asarray(anchors)))
    want = numpy_hash_encode(params, pts, anchors)
    # atol bounded by fp32 ulp of the fine-level scaled coordinates
    # (pt ~ 1e3 -> frac ulp ~1e-4 -> feature noise ~1e-5)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)


def test_production_packed_fwd_matches_raw_to_bf16():
    """hash_encode_sorted's forward uses the bf16 channel-pair-packed flat
    table (the reference stores fp16, Hash3DAnchored_cuda.cu:141-155); it
    must match the f32 baseline to bf16 table precision."""
    from gfnerf_tpu.fields.hash_encoding import hash_encode_sorted

    params = init_hash_params(seed=0, log2_table_size=10, n_volumes=3)
    rng = np.random.default_rng(1)
    pts = jnp.asarray(rng.random((64, 3)), jnp.float32)
    anchors = jnp.asarray(rng.integers(-1, 3, 64), jnp.int32)
    base = np.asarray(hash_encode(params, pts, anchors))
    fast = np.asarray(hash_encode_sorted(
        params.feat_pool, params.prim_pool, params.bias_pool, pts, anchors))
    # table init range is +-1e-2; bf16 has ~2^-8 relative error
    np.testing.assert_allclose(fast, base, rtol=2e-2, atol=1e-4)


def test_hash_encode_invalid_anchor_is_zero():
    params = init_hash_params(seed=0, log2_table_size=8, n_volumes=2)
    pts = jnp.ones((4, 3)) * 0.5
    anchors = jnp.array([-1, -1, 0, 1], jnp.int32)
    out = np.asarray(hash_encode(params, pts, anchors))
    assert np.all(out[:2] == 0)
    assert np.any(out[2:] != 0)


def test_hash_encode_gradient_flows_to_pool():
    params = init_hash_params(seed=0, log2_table_size=8, n_volumes=2)
    pts = jnp.asarray(np.random.default_rng(2).random((16, 3)), jnp.float32)
    anchors = jnp.zeros((16,), jnp.int32)

    def loss(feat_pool):
        p = params.replace(feat_pool=feat_pool)
        return jnp.sum(hash_encode(p, pts, anchors) ** 2)

    g = jax.grad(loss)(params.feat_pool)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.sum(jnp.abs(g))) > 0


def test_anchored_decorrelation():
    """Different volumes hash the same point differently (the 'anchored' part)."""
    params = init_hash_params(seed=0, log2_table_size=12, n_volumes=2)
    pts = jnp.asarray(np.random.default_rng(3).random((8, 3)), jnp.float32)
    out0 = np.asarray(hash_encode(params, pts, jnp.zeros(8, jnp.int32)))
    out1 = np.asarray(hash_encode(params, pts, jnp.ones(8, jnp.int32)))
    assert not np.allclose(out0, out1)


def test_sorted_bwd_matches_autodiff_c2_and_c4():
    """The sorted custom-VJP backward equals XLA autodiff scatter (to bf16
    packing precision) for both 2 and 4 channels per level."""
    from gfnerf_tpu.fields.hash_encoding import (hash_encode_raw,
                                                 hash_encode_sorted)

    for n_channels in (2, 4):
        params = init_hash_params(seed=0, log2_table_size=10, n_volumes=2,
                                  n_levels=4, n_channels=n_channels)
        rng = np.random.default_rng(3)
        pts = jnp.asarray(rng.random((200, 3)), jnp.float32)
        anc = jnp.asarray(rng.integers(-1, 2, 200), jnp.int32)

        g_ref = jax.grad(lambda f: (hash_encode_raw(
            f, params.prim_pool, params.bias_pool, pts, anc) ** 2).sum())(
                params.feat_pool)
        g_new = jax.grad(lambda f: (hash_encode_sorted(
            f, params.prim_pool, params.bias_pool, pts, anc) ** 2).sum())(
                params.feat_pool)
        denom = float(jnp.abs(g_ref).max()) + 1e-9
        rel = float(jnp.abs(g_ref - g_new).max()) / denom
        assert rel < 0.02, (n_channels, rel)
