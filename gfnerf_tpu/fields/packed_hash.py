"""Packed (supercell) anchored hash encoding — the TPU-native fast layout.

The reference's hash grid (``gfnerf/bindings/field/Hash3DAnchored_cuda.cu``)
does 8 independent table lookups per (point, level) — one per interpolation
corner.  On GPU those are cheap (coalesced loads + fp16 ``atomicAdd`` for the
backward).  On TPU, random-row gathers are *row-count bound* (~100-370 M
rows/s regardless of width up to 512 B, measured on v5e; PERF_NOTES.md) and
there are no scatter atomics at all, so the corner-per-row layout wastes the
memory system 8x.

This module trades hash granularity for row width: the table is keyed by
*supercell* (a cube of ``pack``^3 grid cells) and each row stores the feature
vectors of the supercell's full corner lattice ``(pack+1)^3 x C``, padded to
``row_width``.  One gather per (point, level) fetches every corner needed for
trilinear interpolation — 8x fewer rows at the same quality-relevant total
parameter count, and wide (512 B) rows run at the gather sweet spot.

Trade-offs vs the exact layout (``hash_encoding.py``, kept as the parity
config):
- corner features are shared *within* a supercell but duplicated *across*
  supercell boundaries, so the encoding is C0-discontinuous at every
  ``pack``-th cell boundary (the exact layout is discontinuous only at hash
  collisions);
- hash collisions operate at supercell granularity: colliding supercells
  share their whole lattice.

Anchoring is unchanged: per-(level, volume) primes and bias offsets
(Hash3DAnchored.cpp:39-62) decorrelate octree-leaf volumes.

Backward design (TPU has no atomics; XLA scatter-add runs at ~12-25 M rows/s
and XLA cumsum at ~2.9 ns/elem is 50x off memory speed):
  per level —
  1. sort the point->row keys with an iota payload (~1.3 ns/key),
  2. gather the (P, row_width) weight-outer-grad payloads in sorted order
     (wide rows -> gather sweet spot),
  3. inclusive prefix sum over sorted payloads via *block triangular matmuls*
     on the MXU (chunked_prefix below) — the only fast prefix on this chip,
  4. run bounds via ONE binary search of row ids into the sorted keys
     (jnp.searchsorted — no scatter of any kind in the whole backward),
  5. dense grad rows = prefix difference at run boundaries (two wide gathers).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from gfnerf_tpu.fields.hash_encoding import (
    _anchor_slices,
    _anchor_table,
    _level_scales,
    _random_primes,
)


def pack_for_channels(n_channels: int, row_width: int = 128) -> int:
    """Largest supercell edge whose corner lattice fits in ``row_width``."""
    pack = 1
    while (pack + 2) ** 3 * n_channels <= row_width:
        pack += 1
    return pack


def init_packed_hash_params(
    seed: int,
    n_rows_log2: int,
    n_volumes: int,
    n_levels: int,
    n_channels: int,
    row_width: int = 128,
    init_mode: str = "reset",
    rand_bias: bool = True,
):
    """Build (feat_pool, prim_pool, bias_pool) for the packed layout.

    feat_pool: (n_levels, n_rows, row_width) f32 — learnable
    prim_pool: (n_levels, n_volumes, 3) uint32 — fixed
    bias_pool: (n_levels, n_volumes, 3) f32 — fixed
    """
    pack = pack_for_channels(n_channels, row_width)
    lattice = (pack + 1) ** 3
    assert lattice * n_channels <= row_width
    n_rows = 1 << n_rows_log2
    rng = np.random.default_rng(seed)
    primes = _random_primes(rng, 3 * n_levels * n_volumes).reshape(
        n_levels, n_volumes, 3
    )
    if rand_bias:
        bias = (rng.random((n_levels, n_volumes, 3)) * 1000.0 + 100.0).astype(
            np.float32
        )
    else:
        bias = np.zeros((n_levels, n_volumes, 3), dtype=np.float32)
    if init_mode == "zero":
        feat = np.zeros((n_levels, n_rows, row_width), dtype=np.float32)
    elif init_mode == "reset":
        feat = rng.uniform(
            -1e-2, 1e-2, (n_levels, n_rows, row_width)
        ).astype(np.float32)
    else:
        raise ValueError(init_mode)
    return jnp.asarray(feat), jnp.asarray(primes), jnp.asarray(bias)


def _div_pack(cell, pack):
    """floor(cell / pack) for non-negative int32 cells, without the slow
    integer-divide lowering: shift for powers of two, multiply-shift for 3.
    Grid coords are always positive here (points are normalized to
    [0.17, 0.83] and the per-volume bias offsets are >= 100)."""
    if pack & (pack - 1) == 0:
        return jax.lax.shift_right_logical(cell, pack.bit_length() - 1)
    if pack == 3:
        # exact for 0 <= cell < 98304 (fine-level coords top out ~2200)
        return jax.lax.shift_right_logical(cell * 21846, 16)
    return jnp.floor_divide(cell, pack)


def _decompose_dim(pk, pack):
    """One-dimension supercell decomposition on a flat (P,) coordinate.

    All per-point intermediates in this module are kept as SEPARATE (P,)
    arrays (struct-of-arrays): a (P, 3) array gets XLA:TPU's T(8, 128)
    layout — the minor dim of 3 padded to 128 lanes, a 42.7x memory
    expansion — and the backward's rematerialized scan-body temps at that
    layout were the direct cause of a 20 GB HBM OOM on the proposal path
    (results/quality_prop_r3.log).  (P,) arrays tile losslessly.
    """
    cell_f = jnp.floor(pk)
    frac = pk - cell_f                       # (P,) in [0, 1)
    cell = cell_f.astype(jnp.int32)
    sup = _div_pack(cell, pack)              # (P,)
    local = cell - sup * pack                # (P,) in [0, pack)
    return sup, local, frac


def _dim_w(local, frac, e):
    """(P, e) per-dim lattice weights: (1-f) at local, f at local+1."""
    u = jnp.arange(e, dtype=jnp.int32)[None, :]
    lk = local[:, None]
    fk = frac[:, None]
    return (u == lk) * (1.0 - fk) + (u == lk + 1) * fk


def _lattice_weights(wx, wy, wz):
    """(P, e^3) trilinear lattice weights from per-dim (P, e) factors."""
    p, e = wx.shape
    return (wx[:, :, None, None] * wy[:, None, :, None]
            * wz[:, None, None, :]).reshape(p, e ** 3)


def _hash_flat(sx, sy, sz, ux, uy, uz, n_rows):
    """Supercell XOR hash (Hash3DAnchored_cuda.cu:48-55 scheme) from flat
    (P,) supercell coords and flat (P,) per-point primes."""
    h = (sx.astype(jnp.uint32) * ux
         ^ sy.astype(jnp.uint32) * uy
         ^ sz.astype(jnp.uint32) * uz)
    return (h & jnp.uint32(n_rows - 1)).astype(jnp.int32)


def dense_level_extents(n_levels, pack, n_volumes, n_rows, dense_levels):
    """Static per-level dense-grid extents for collision-free addressing.

    QUALITY.md finding 7 fix (b): the focal fog mode is driven by residual
    rows hash-shared between surface and empty-space cells; a level whose
    per-volume supercell grid fits the table — ``V * m^3 <= n_rows`` with
    ``m`` the grid extent — can instead be addressed LINEARLY
    (``vol*m^3 + (sx%m)*m^2 + (sy%m)*m + sz%m``), which is injective within
    every volume (normalized coords span [0, scale], so the span is < m and
    the mod never wraps two live cells together).  Returns (m (L,), use
    (L,) bool): levels beyond ``dense_levels`` or too big to fit keep the
    XOR hash.
    """
    scales = _level_scales(n_levels)
    m = np.zeros((n_levels,), np.int32)
    use = np.zeros((n_levels,), bool)
    for l in range(min(dense_levels, n_levels)):
        ml = int(np.ceil(scales[l] / pack)) + 2
        if n_volumes * ml ** 3 <= n_rows:
            m[l] = ml
            use[l] = True
    return m, use


def _dense_or_hash_idx(sx, sy, sz, ux, uy, uz, n_rows, vol, m, use_dense):
    """Row index per point: collision-free linear addressing when
    ``use_dense`` (m > 0), else the XOR hash.  Both are cheap (P,) integer
    arithmetic; computing both and selecting keeps the level loop/scan body
    uniform."""
    h_hash = _hash_flat(sx, sy, sz, ux, uy, uz, n_rows)
    ms = jnp.maximum(m, 1)
    h_dense = (vol * ms * ms * ms
               + jnp.remainder(sx, ms) * ms * ms
               + jnp.remainder(sy, ms) * ms
               + jnp.remainder(sz, ms))
    h_dense = jnp.minimum(h_dense, n_rows - 1)   # safety clamp
    return jnp.where(use_dense, h_dense, h_hash)


def packed_hash_encode_raw(
    feat_pool: jnp.ndarray,   # (L, n_rows, row_width) f32
    prim_pool: jnp.ndarray,   # (L, V, 3) uint32
    bias_pool: jnp.ndarray,   # (L, V, 3) f32
    points: jnp.ndarray,      # (P, 3) f32, normalized ((warp+1.5)/3)
    anchors: jnp.ndarray,     # (P,) int32 volume index; < 0 -> masked output
    n_channels: int,
    pack: int,
    dense_levels: int = 0,
) -> jnp.ndarray:
    """Forward packed encoding. Returns (P, L * n_channels).

    The table is gathered through a single *flat bf16 view*: random-row
    gather throughput on v5e drops ~2.3x once the source array exceeds
    ~96-128 MB (measured; PERF_NOTES.md), so the f32 parameter table is cast
    to bf16 (the reference stores its tables in fp16 outright,
    Hash3DAnchored setup.py:113) and flattened so per-level slicing never
    re-materializes views of the large parent.

    ``dense_levels``: the first k levels use collision-free linear
    addressing when their per-volume grid fits the table (see
    :func:`dense_level_extents`; QUALITY.md finding 7 fix (b) — residual
    tables only).
    """
    n_levels, n_rows, row_width = feat_pool.shape
    n_volumes = prim_pool.shape[1]
    lattice = (pack + 1) ** 3
    e = pack + 1
    valid = (anchors >= 0)[:, None]
    vol = jnp.clip(anchors, 0, n_volumes - 1).astype(jnp.int32)
    scales = _level_scales(n_levels)
    dm, duse = dense_level_extents(n_levels, pack, n_volumes, n_rows,
                                   dense_levels)
    flat = feat_pool.astype(jnp.bfloat16).reshape(n_levels * n_rows,
                                                  row_width)
    ar = _anchor_table(prim_pool, bias_pool)[vol]   # (P, L*8), one gather
    px0, py0, pz0 = points[:, 0], points[:, 1], points[:, 2]
    outs = []
    for l in range(n_levels):
        (ux, uy, uz), (bx, by, bz) = _anchor_slices(ar, l * 8)
        sx, lx, fx = _decompose_dim(px0 * scales[l] + bx, pack)
        sy, ly, fy = _decompose_dim(py0 * scales[l] + by, pack)
        sz, lz, fz = _decompose_dim(pz0 * scales[l] + bz, pack)
        if duse[l]:
            ml = int(dm[l])
            h = jnp.minimum(
                vol * ml ** 3
                + jnp.remainder(sx, ml) * ml * ml
                + jnp.remainder(sy, ml) * ml
                + jnp.remainder(sz, ml), n_rows - 1)
        else:
            h = _hash_flat(sx, sy, sz, ux, uy, uz, n_rows)
        rows = flat[h + l * n_rows]                  # (P, row_width) bf16
        outs.extend(_interp_level(rows, fx, fy, fz, lx, ly, lz, e,
                                  n_channels))
    # ONE (P, L*C) materialization for the whole encode (flat (P,) columns
    # everywhere upstream — see _interp_level's layout note)
    return (jnp.stack(outs, axis=-1) * valid).astype(jnp.float32)


def _interp_level(rows, fx, fy, fz, lx, ly, lz, e, n_channels):
    """Per-level lattice interpolation from gathered (P, row_width) rows.

    Returns a LIST of ``n_channels`` flat (P,) float32 arrays (the caller
    stacks all levels' channels once); every intermediate here is also a
    flat (P,) array.

    Chip-measured layout rule (r5, falsifying the r4/r5 "(P, C) lane
    slice" design): on TPU any materialized 2-D temp with a narrow minor
    dim pads to T(8, 128) tiles — a (P, 1) weight column is a 128x
    expansion (12 MB -> 1.5 GB at P = 3.1 M) and a (P, 4) slice is 32x.
    The lane-slice form relied on XLA fusing every such temp away; the
    chip showed it does not (remat/fusion boundaries materialized them:
    compile-time HBM OOM at 31 G for the S=384 encode, and the S=160
    variant that did fit ran SLOWER per point than the (P, e^3) einsum it
    replaced).  Flat (P,) arrays have no narrow minor dim — they tile
    densely whether or not XLA fuses — so this form is padding-free by
    construction, not by fusion luck.

    e == 2 (pack=1): local == 0 everywhere and the 8 lattice entries ARE
    the 8 trilinear corners (lattice order o = i*4 + j*2 + k) — a 7-lerp
    chain per channel.

    e >= 3 (the live C=4 row_width=128 config is pack=2, e=3): the
    point's cell sits at a per-point dynamic (lx, ly, lz) offset inside
    the supercell lattice, so corner columns cannot be picked statically;
    the trilinear sum is factorized per axis with per-point scalar
    weights w_u = (u == l)(1-f) + (u == l+1)f — e^3 + e^2 + e fused
    multiply-adds per channel on (P,) columns.
    """
    C = n_channels

    def col(o, c):
        # one lattice entry's channel as a flat (P,) f32 column
        return rows[:, o * C + c].astype(jnp.float32)

    if e == 2:
        chans = []
        for c in range(C):
            z00 = col(0, c) + fz * (col(1, c) - col(0, c))
            z01 = col(2, c) + fz * (col(3, c) - col(2, c))
            z10 = col(4, c) + fz * (col(5, c) - col(4, c))
            z11 = col(6, c) + fz * (col(7, c) - col(6, c))
            y0 = z00 + fy * (z01 - z00)
            y1 = z10 + fy * (z11 - z10)
            chans.append(y0 + fx * (y1 - y0))
        return chans

    def dim_w(local, frac, u):
        # (P,) weight of lattice position u along one axis
        return (u == local) * (1.0 - frac) + (u == local + 1) * frac

    wx = [dim_w(lx, fx, i) for i in range(e)]
    wy = [dim_w(ly, fy, j) for j in range(e)]
    wz = [dim_w(lz, fz, k) for k in range(e)]
    chans = []
    for c in range(C):
        out = None
        for i in range(e):
            acc_y = None
            for j in range(e):
                base = (i * e + j) * e
                acc_z = None
                for k in range(e):
                    term = wz[k] * col(base + k, c)
                    acc_z = term if acc_z is None else acc_z + term
                term = wy[j] * acc_z
                acc_y = term if acc_y is None else acc_y + term
            term = wx[i] * acc_y
            out = term if out is None else out + term
        chans.append(out)
    return chans


def packed_hash_encode_routed(
    block_feats: jnp.ndarray,   # (B, L, n_rows, row_width) f32
    block_prims: jnp.ndarray,   # (B, L, V, 3) uint32
    block_biases: jnp.ndarray,  # (B, L, V, 3) f32
    points: jnp.ndarray,        # (P, 3) f32
    anchors: jnp.ndarray,       # (P,) int32 volume; < 0 -> masked output
    blocks: jnp.ndarray,        # (P,) int32 per-point BLOCK; < 0 -> masked
    n_channels: int,
    pack: int,
    dense_levels: int = 0,
) -> jnp.ndarray:
    """Per-point block-ROUTED residual encoding (eval path, forward only).

    Each point reads its own block's residual table: the stacked tables
    flatten to one (B*L*rows, width) gather source and the block id simply
    offsets the row index, so routing costs the same one gather per
    (point, level) as the single-block path.  This is what lets a mixed
    eval batch (rays from every cluster) render in ONE chunk instead of
    per-(split, nearest) groups padded to the chunk size (VERDICT r3
    weak 6), and it is the natural TPU form of the reference's per-block
    eval routing (nerfacto_field.py:526-533 picks the block table by the
    camera's cluster).
    """
    n_blocks, n_levels, n_rows, row_width = block_feats.shape
    n_volumes = block_prims.shape[2]
    e = pack + 1
    valid = ((anchors >= 0) & (blocks >= 0))[:, None]
    vol = jnp.clip(anchors, 0, n_volumes - 1).astype(jnp.int32)
    blk = jnp.clip(blocks, 0, n_blocks - 1).astype(jnp.int32)
    scales = _level_scales(n_levels)
    dm, duse = dense_level_extents(n_levels, pack, n_volumes, n_rows,
                                   dense_levels)
    flat = block_feats.astype(jnp.bfloat16).reshape(
        n_blocks * n_levels * n_rows, row_width)
    ar_all = jax.vmap(_anchor_table)(block_prims, block_biases)  # (B, V, L8)
    ar = ar_all.reshape(n_blocks * n_volumes, n_levels * 8)[
        blk * n_volumes + vol]                       # (P, L*8), one gather
    row_base = blk * (n_levels * n_rows)             # (P,)
    px0, py0, pz0 = points[:, 0], points[:, 1], points[:, 2]
    outs = []
    for l in range(n_levels):
        (ux, uy, uz), (bx, by, bz) = _anchor_slices(ar, l * 8)
        sx, lx, fx = _decompose_dim(px0 * scales[l] + bx, pack)
        sy, ly, fy = _decompose_dim(py0 * scales[l] + by, pack)
        sz, lz, fz = _decompose_dim(pz0 * scales[l] + bz, pack)
        if duse[l]:
            ml = int(dm[l])
            h = jnp.minimum(
                vol * ml ** 3
                + jnp.remainder(sx, ml) * ml * ml
                + jnp.remainder(sy, ml) * ml
                + jnp.remainder(sz, ml), n_rows - 1)
        else:
            h = _hash_flat(sx, sy, sz, ux, uy, uz, n_rows)
        rows = flat[row_base + l * n_rows + h]       # (P, row_width) bf16
        outs.extend(_interp_level(rows, fx, fy, fz, lx, ly, lz, e,
                                  n_channels))
    return (jnp.stack(outs, axis=-1) * valid).astype(jnp.float32)


def chunked_prefix(x: jnp.ndarray, chunk: int = 256,
                   _exact: bool = False) -> jnp.ndarray:
    """Inclusive prefix sum along axis 0 of (N, W), f32 accumulation.

    XLA's native cumsum on TPU runs at ~2.9 ns/element (sequential sublane
    shifts); this does the intra-block prefix as a lower-triangular matmul on
    the MXU.  The block carries recurse into chunked_prefix themselves when
    there are many blocks (at N ~ 1.3 M a (N/chunk, W) native cumsum would
    cost more than the matmuls).  The payload matmul quantizes its input to
    bf16 (accumulating f32) — callers can pass x in bf16 outright to halve
    the payload's HBM traffic at identical results.  The recursive CARRY
    level runs its matmul in full f32 (``_exact``): the block totals are f32
    partial sums, and re-quantizing them to bf16 would accumulate ~2^-9
    relative error in segment sums spanning block boundaries.  The carry
    level is (N/chunk, W) — tiny next to the payload — so the f32 matmul
    costs nothing.
    """
    n, w = x.shape
    rem = (-n) % chunk
    if rem:
        x = jnp.pad(x, ((0, rem), (0, 0)))
    nb = (n + rem) // chunk
    xb = x.reshape(nb, chunk, w)
    mm_dtype = jnp.float32 if _exact else jnp.bfloat16
    tri = jnp.tril(jnp.ones((chunk, chunk), mm_dtype))
    intra = jax.lax.dot_general(
        tri, xb.astype(mm_dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                            # (chunk, nb, w)
    intra = jnp.moveaxis(intra, 0, 1)            # (nb, chunk, w)
    totals = intra[:, -1, :]                     # (nb, w)
    if nb > 256:
        carry = chunked_prefix(totals, chunk, _exact=True) - totals
    else:
        carry = jnp.cumsum(totals, axis=0) - totals  # exclusive over blocks
    return (intra + carry[:, None, :]).reshape(nb * chunk, w)[:n]


def _runend_diff(skeys, prefix, n_rows):
    """Dense (n_rows, W) segment sums from sorted keys + inclusive prefix.

    Segment bounds come from ONE binary search of the row ids into the
    sorted keys (``n_rows`` queries x log2(P) vector gathers) — replacing
    the previous P-row scatter-max of run-end positions, which at the
    ~146 M rows/s int32 scatter rate was the hidden dominant cost of the
    backward (P = 1.3 M rows/level at the bench shape => ~9 ms/level).
    ``hi[r]`` counts keys <= r, so ``lo[r] = hi[r-1]`` counts keys < r and
    absent rows (hi == lo) vanish without any mask scatter.
    """
    hi = jnp.searchsorted(
        skeys, jnp.arange(n_rows, dtype=skeys.dtype), side="right"
    ).astype(jnp.int32)
    lo = jnp.concatenate([jnp.zeros((1,), jnp.int32), hi[:-1]])
    p_end = prefix[jnp.maximum(hi - 1, 0)]
    p_lo = jnp.where((lo > 0)[:, None], prefix[jnp.maximum(lo - 1, 0)], 0.0)
    return jnp.where((hi > lo)[:, None], p_end - p_lo, 0.0)


def _sorted_segment_rows(keys, payload, n_rows, payload_fn=None):
    """Dense (n_rows, W) sums of payload rows grouped by keys in [0, n_rows).

    sort + MXU prefix + binary-search run-end diff; no scatter anywhere.

    ``payload_fn``: when given, ``payload`` is a narrow per-row input array
    and the (wide) prefix payload is computed as ``payload_fn(payload[perm])``
    — gathering the narrow inputs and recomputing beats gathering wide rows
    from a >100 MB payload array (the v5e gather source-size cliff).
    """
    p = keys.shape[0]
    skeys, perm = jax.lax.sort(
        (keys, jnp.arange(p, dtype=jnp.int32)), dimension=0, num_keys=1
    )
    spay = payload[perm]                         # sorted-order gather
    if payload_fn is not None:
        spay = payload_fn(spay)
    prefix = chunked_prefix(spay)                # (P, W) f32
    return _runend_diff(skeys, prefix, n_rows)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def packed_hash_encode(feat_pool, prim_pool, bias_pool, points, anchors,
                       n_channels, pack, dense_levels=0):
    return packed_hash_encode_raw(feat_pool, prim_pool, bias_pool, points,
                                  anchors, n_channels, pack, dense_levels)


def _phe_fwd(feat_pool, prim_pool, bias_pool, points, anchors, n_channels,
             pack, dense_levels):
    out = packed_hash_encode_raw(feat_pool, prim_pool, bias_pool, points,
                                 anchors, n_channels, pack, dense_levels)
    return out, (feat_pool.shape, prim_pool, bias_pool, points, anchors)


def _phe_bwd(n_channels, pack, dense_levels, res, g):
    feat_shape, prim_pool, bias_pool, points, anchors = res
    n_levels, n_rows, row_width = feat_shape
    n_volumes = prim_pool.shape[1]
    p = points.shape[0]
    lattice = (pack + 1) ** 3
    valid = (anchors >= 0).astype(points.dtype)
    vol = jnp.clip(anchors, 0, n_volumes - 1).astype(jnp.int32)
    scales = jnp.asarray(_level_scales(n_levels))
    dm, duse = dense_level_extents(n_levels, pack, n_volumes, n_rows,
                                   dense_levels)
    g = g.reshape(p, n_levels, n_channels)

    ar = _anchor_table(prim_pool, bias_pool)[vol]   # (P, L*8), one gather
    px0, py0, pz0 = points[:, 0], points[:, 1], points[:, 2]
    e = pack + 1

    def level_fn(carry, xs):
        lidx, scale_l, g_l, m_l, use_l = xs
        arl = jax.lax.dynamic_slice_in_dim(ar, lidx * 8, 8, axis=1)
        (ux, uy, uz), (bx, by, bz) = _anchor_slices(arl, 0)
        sx, lx, fx = _decompose_dim(px0 * scale_l + bx, pack)
        sy, ly, fy = _decompose_dim(py0 * scale_l + by, pack)
        sz, lz, fz = _decompose_dim(pz0 * scale_l + bz, pack)
        h = _dense_or_hash_idx(sx, sy, sz, ux, uy, uz, n_rows, vol, m_l,
                               use_l)
        # narrow per-row inputs; the wide (P, row_width) payload is
        # recomputed AFTER the permutation gather (see _sorted_segment_rows).
        # local + frac merge losslessly into one column per dim
        # (cf = local + frac < pack + 1; floor recovers local exactly).
        gv = g_l * valid[:, None]
        inp = jnp.concatenate(
            [(lx.astype(jnp.float32) + fx)[:, None],
             (ly.astype(jnp.float32) + fy)[:, None],
             (lz.astype(jnp.float32) + fz)[:, None], gv], axis=-1)  # (P, 3+C)

        def payload_fn(s):
            scf, sg = s[:, :3], s[:, 3:]
            sl = jnp.floor(scf)
            sf = scf - sl
            wgt = _lattice_weights(
                _dim_w(sl[:, 0], sf[:, 0], e),
                _dim_w(sl[:, 1], sf[:, 1], e),
                _dim_w(sl[:, 2], sf[:, 2], e))
            pay = (wgt[:, :, None] * sg[:, None, :]).reshape(
                p, lattice * n_channels)
            # the prefix matmul quantizes to bf16 anyway; storing the wide
            # payload in bf16 halves its HBM traffic (grads are fp16-class
            # in the reference's atomicAdd backward too)
            return pay.astype(jnp.bfloat16)

        # The prefix + run-end machinery runs at the LIVE width
        # (lattice * n_channels); the dense grad is padded to row_width only
        # at the end — at C=4/pack=1 that is 32 live of 128 columns, a 4x
        # saving on the MXU prefix and the run-bound gathers.
        dense = _sorted_segment_rows(h, inp, n_rows, payload_fn)
        if lattice * n_channels < row_width:
            dense = jnp.pad(
                dense, ((0, 0), (0, row_width - lattice * n_channels)))
        return carry, dense

    _, grads = jax.lax.scan(
        level_fn, None,
        (jnp.arange(n_levels, dtype=jnp.int32), scales,
         jnp.moveaxis(g, 1, 0), jnp.asarray(dm), jnp.asarray(duse)),
    )
    return (grads, None, None, None, None)


packed_hash_encode.defvjp(_phe_fwd, _phe_bwd)
