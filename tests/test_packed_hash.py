"""Golden tests for the packed (supercell) hash encoding.

Forward is checked against an independent numpy model; the custom-VJP
backward is checked against jax.grad of the raw forward (whose table grad
XLA computes via its native scatter-add).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gfnerf_tpu.fields.hash_encoding import _level_scales
from gfnerf_tpu.fields.packed_hash import (
    chunked_prefix,
    init_packed_hash_params,
    pack_for_channels,
    packed_hash_encode,
    packed_hash_encode_raw,
)


def _numpy_packed_encode(feat, prim, bias, points, anchors, C, pack):
    L, n_rows, row_width = feat.shape
    P = points.shape[0]
    lattice = (pack + 1) ** 3
    scales = _level_scales(L)
    out = np.zeros((P, L * C), np.float32)
    for p in range(P):
        if anchors[p] < 0:
            continue
        v = anchors[p]
        for l in range(L):
            pt = points[p] * scales[l] + bias[l, v]
            cell = np.floor(pt).astype(np.int64)
            frac = pt - np.floor(pt)
            sup = cell // pack
            local = cell - sup * pack
            h = ((np.uint32(sup[0]) * prim[l, v, 0])
                 ^ (np.uint32(sup[1]) * prim[l, v, 1])
                 ^ (np.uint32(sup[2]) * prim[l, v, 2])) & np.uint32(n_rows - 1)
            row = feat[l, int(h), : lattice * C].reshape(
                pack + 1, pack + 1, pack + 1, C
            )
            for dx in (0, 1):
                for dy in (0, 1):
                    for dz in (0, 1):
                        w = ((frac[0] if dx else 1 - frac[0])
                             * (frac[1] if dy else 1 - frac[1])
                             * (frac[2] if dz else 1 - frac[2]))
                        out[p, l * C:(l + 1) * C] += w * row[
                            local[0] + dx, local[1] + dy, local[2] + dz
                        ]
    return out


def test_pack_for_channels():
    assert pack_for_channels(2, 128) == 3   # 4^3 * 2 = 128
    assert pack_for_channels(4, 128) == 2   # 3^3 * 4 = 108
    assert pack_for_channels(8, 128) == 1   # 2^3 * 8 = 64


def test_forward_matches_numpy():
    C, L = 2, 3
    pack = pack_for_channels(C)
    feat, prim, bias = init_packed_hash_params(
        seed=0, n_rows_log2=6, n_volumes=4, n_levels=L, n_channels=C
    )
    rng = np.random.default_rng(1)
    P = 64
    pts = rng.uniform(0.2, 0.8, (P, 3)).astype(np.float32)
    anc = rng.integers(-1, 4, P).astype(np.int32)
    got = packed_hash_encode_raw(feat, prim, bias, jnp.asarray(pts),
                                 jnp.asarray(anc), C, pack)
    want = _numpy_packed_encode(np.asarray(feat), np.asarray(prim),
                                np.asarray(bias), pts, anc, C, pack)
    # table + weights pass through bf16 on the gather path (by design —
    # the reference's tables are fp16)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1.5e-2,
                               atol=2e-4)


def test_chunked_prefix_matches_cumsum():
    rng = np.random.default_rng(0)
    for n in (512, 1024, 1000, 77):
        x = rng.standard_normal((n, 8)).astype(np.float32)
        got = chunked_prefix(jnp.asarray(x), chunk=256)
        want = np.cumsum(x, axis=0)
        # bf16 matmul terms: each input rounds to ~3 decimal digits before
        # exact f32 accumulation, so error grows ~0.004 * sqrt(run length)
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-2,
                                   atol=0.004 * np.sqrt(n) + 0.01)


def test_backward_matches_autodiff_scatter():
    C, L = 2, 2
    pack = pack_for_channels(C)
    feat, prim, bias = init_packed_hash_params(
        seed=0, n_rows_log2=5, n_volumes=2, n_levels=L, n_channels=C
    )
    rng = np.random.default_rng(2)
    P = 200
    pts = jnp.asarray(rng.uniform(0.2, 0.8, (P, 3)).astype(np.float32))
    anc = jnp.asarray(rng.integers(-1, 2, P).astype(np.int32))
    ct = jnp.asarray(rng.standard_normal((P, L * C)).astype(np.float32))

    def loss_custom(f):
        return jnp.sum(packed_hash_encode(f, prim, bias, pts, anc, C, pack)
                       * ct)

    def loss_raw(f):
        return jnp.sum(
            packed_hash_encode_raw(f, prim, bias, pts, anc, C, pack) * ct
        )

    g_custom = jax.grad(loss_custom)(feat)
    g_raw = jax.grad(loss_raw)(feat)
    # payload terms pass through bf16 in the MXU prefix
    np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_raw),
                               rtol=2e-2, atol=2e-2)
    # padding columns must stay zero (C=2/pack=3 has none; check C=4)
    lattice = (pack + 1) ** 3
    if lattice * C < g_custom.shape[-1]:
        assert float(jnp.abs(g_custom[:, :, lattice * C:]).max()) == 0.0


def test_backward_padding_zero_c4():
    C, L = 4, 2
    pack = pack_for_channels(C)          # 2 -> 27*4=108 < 128
    feat, prim, bias = init_packed_hash_params(
        seed=0, n_rows_log2=5, n_volumes=1, n_levels=L, n_channels=C
    )
    rng = np.random.default_rng(3)
    pts = jnp.asarray(rng.uniform(0.2, 0.8, (64, 3)).astype(np.float32))
    anc = jnp.zeros((64,), jnp.int32)
    ct = jnp.asarray(rng.standard_normal((64, L * C)).astype(np.float32))
    g = jax.grad(lambda f: jnp.sum(
        packed_hash_encode(f, prim, bias, pts, anc, C, pack) * ct))(feat)
    assert float(jnp.abs(g[:, :, 108:]).max()) == 0.0
    g_raw = jax.grad(lambda f: jnp.sum(
        packed_hash_encode_raw(f, prim, bias, pts, anc, C, pack) * ct))(feat)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_raw), rtol=2e-2,
                               atol=2e-2)


def test_forward_valid_masking():
    C = 2
    pack = pack_for_channels(C)
    feat, prim, bias = init_packed_hash_params(
        seed=0, n_rows_log2=5, n_volumes=2, n_levels=2, n_channels=C
    )
    pts = jnp.asarray(np.random.default_rng(0).uniform(0.2, 0.8, (8, 3)),
                      jnp.float32)
    anc = jnp.full((8,), -1, jnp.int32)
    out = packed_hash_encode_raw(feat, prim, bias, pts, anc, C, pack)
    assert float(jnp.abs(out).max()) == 0.0


def test_block_rows_log2_decoupled():
    """FieldConfig.block_rows_log2: residual tables may be a different size
    than the global table (the capacity-bound focal regime, QUALITY.md
    finding 5) — row count is read from each table's own shape."""
    from gfnerf_tpu.fields.field import (
        STAGE_BLOCK, FieldConfig, field_density, init_field_params)

    cfg = FieldConfig(num_images=4, n_volumes=4, num_levels=4,
                      features_per_level=4, hash_layout="packed",
                      packed_rows_log2=7, block_rows_log2=9, n_blocks=2)
    params, statics = init_field_params(cfg, seed=0)
    assert params.global_feat.shape[1] == 128
    assert params.block_feats.shape[2] == 512
    pts = jnp.asarray(
        np.random.default_rng(0).uniform(-0.5, 0.5, (32, 3)), jnp.float32)
    anc = jnp.zeros((32,), jnp.int32)

    def loss(tbl):
        d, _ = field_density(params, statics, cfg, pts, anc, STAGE_BLOCK,
                             0, tbl)
        return jnp.sum(d)

    g = jax.grad(loss)(params.block_feats[0])
    assert g.shape == params.block_feats[0].shape
    assert bool(jnp.any(g != 0))
