"""Anchored multi-resolution hash encoding (TPU-native).

Reimplements the math of the reference's ``Hash3DAnchored`` CUDA kernels
(``gfnerf/bindings/field/Hash3DAnchored_cuda.cu:12-155`` and constructor
``Hash3DAnchored.cpp:17-75``) in pure JAX:

- 16 levels x 2 channels, per-level resolution ``exp2(3 + 7*l/15)`` (8..1024)
  (``Hash3DAnchored.h:17-22``, ``_cuda.cu:28``).
- *Anchored* hashing: hash primes and bias offsets are per-(level, volume),
  where "volume" is the octree-leaf warp anchor (``trans_idx``), so each leaf
  volume addresses the shared table through a decorrelated hash
  (``Hash3DAnchored.cpp:39-62``).
- Corner hash ``(x*pa ^ y*pb ^ z*pc) mod local_size`` with uint32 wraparound
  (``_cuda.cu:48-55``), trilinear interpolation of the 8 corners.

Differences from the reference, by TPU design:
- the backward scatter uses XLA's native gather-VJP (sorted scatter-add) in
  float32 instead of fp16 ``atomicAdd`` + x128 loss scaling
  (``_cuda.cu:141-155``, ``Hash3DAnchored.cpp:209-238``) — no loss-scale
  bookkeeping is needed;
- the feature pool is stored ``(n_levels, local_size, n_channels)`` instead of
  a flat pool with per-level offsets (identical addressing, since all levels
  share one local_size);
- invalid anchors (< 0) are clamped to volume 0 and the output masked, keeping
  shapes static.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from gfnerf_tpu.utils.structs import dataclass, static_field

N_CHANNELS = 2          # Hash3DAnchored.h:17
N_LEVELS = 16           # Hash3DAnchored.h:18
RES_FINE_POW_2 = 10.0   # Hash3DAnchored.h:20
RES_BASE_POW_2 = 3.0    # Hash3DAnchored.h:22


@dataclass
class HashEncodingParams:
    """State of one anchored hash encoding.

    ``feat_pool`` is the learnable table; ``prim_pool``/``bias_pool`` are
    fixed at construction (the reference also never trains them,
    Hash3DAnchored.cpp:136-148 puts only feat_pool in the optimizer).
    Training code keeps the two groups in separate pytrees so jax.grad only
    sees float leaves; this wrapper is the convenience view.
    """

    feat_pool: jnp.ndarray   # (n_levels, local_size, n_channels) float32 — learnable
    prim_pool: jnp.ndarray   # (n_levels, n_volumes, 3) uint32 — fixed primes
    bias_pool: jnp.ndarray   # (n_levels, n_volumes, 3) float32 — fixed offsets


def _is_prime_vec(n: np.ndarray) -> np.ndarray:
    """Deterministic Miller-Rabin for 32-bit ints (bases 2, 7, 61), vectorized."""
    n = n.astype(np.uint64)
    res = np.ones(n.shape, dtype=bool)
    res &= (n % 2 == 1) & (n > 2)
    d = (n - 1) >> 1
    r = np.ones_like(n)
    more = (d % 2 == 0)
    while more.any():
        d = np.where(more, d >> 1, d)
        r = np.where(more, r + 1, r)
        more = more & (d % 2 == 0)

    def powmod(base, exp, mod):
        out = np.ones_like(mod)
        b = base % mod
        e = exp.copy()
        while (e > 0).any():
            bit = (e & 1).astype(bool)
            out = np.where(bit, (out * b) % mod, out)
            e = e >> 1
            b = (b * b) % mod
        return out

    for a in (2, 7, 61):
        a_arr = np.full_like(n, a)
        x = powmod(a_arr, d, n)
        ok = (x == 1) | (x == n - 1)
        cur = x.copy()
        for i in range(32):
            cur = (cur * cur) % n
            ok |= (cur == n - 1) & (np.uint64(i + 1) < r)
        res &= ok | (n == a)
    return res


def _random_primes(rng: np.random.Generator, count: int) -> np.ndarray:
    """Random primes in [2^28, 2^30) (Hash3DAnchored.cpp:39-54)."""
    out = np.empty((count,), dtype=np.uint32)
    n = 0
    while n < count:
        cand = rng.integers(1 << 28, 1 << 30, size=max(2 * (count - n), 64),
                            dtype=np.int64)
        cand = cand[_is_prime_vec(cand)]
        take = min(len(cand), count - n)
        out[n:n + take] = cand[:take].astype(np.uint32)
        n += take
    return out


def init_hash_params(
    seed: int,
    log2_table_size: int,
    n_volumes: int,
    n_levels: int = N_LEVELS,
    n_channels: int = N_CHANNELS,
    init_mode: str = "reset",
    rand_bias: bool = True,
) -> HashEncodingParams:
    """Build encoding state.

    ``init_mode``: "reset" = uniform(-1e-2, 1e-2) (the global table — the
    reference calls ``.reset()`` right after construction,
    ``gfnerf/nerfacto_field.py:200``); "zero" = zeros (focal residual tables,
    ``nerfacto_field.py:345``).
    """
    local_size = (((1 << log2_table_size) >> 4) << 4)  # Hash3DAnchored.cpp:66-67
    rng = np.random.default_rng(seed)
    primes = _random_primes(rng, 3 * n_levels * n_volumes).reshape(
        n_levels, n_volumes, 3
    )
    if rand_bias:
        bias = (rng.random((n_levels, n_volumes, 3)) * 1000.0 + 100.0).astype(
            np.float32
        )  # Hash3DAnchored.cpp:58
    else:
        bias = np.zeros((n_levels, n_volumes, 3), dtype=np.float32)

    if init_mode == "zero":
        feat = np.zeros((n_levels, local_size, n_channels), dtype=np.float32)
    elif init_mode == "reset":
        feat = rng.uniform(-1e-2, 1e-2, (n_levels, local_size, n_channels)).astype(
            np.float32
        )  # Hash3DAnchored.cpp:172
    else:
        raise ValueError(init_mode)

    return HashEncodingParams(
        feat_pool=jnp.asarray(feat),
        prim_pool=jnp.asarray(primes),
        bias_pool=jnp.asarray(bias),
    )


def _level_scales(n_levels: int) -> np.ndarray:
    """Per-level resolution multiplier exp2(3 + 7*l/(L-1)) (_cuda.cu:28)."""
    levels = np.arange(n_levels, dtype=np.float32)
    return np.exp2(
        (RES_FINE_POW_2 - RES_BASE_POW_2) * levels / float(n_levels - 1)
        + RES_BASE_POW_2
    )


def _anchor_table(prim_pool, bias_pool):
    """(V, L*8) combined anchor table: each level's 3 primes (bitcast to
    f32) + 3 biases + 2 pad lanes.  ONE (P, L*8) gather then serves every
    level of the encode — gathers are row-count bound on TPU, so folding
    the per-level prim and bias gathers (2L P-row gathers) into a single
    P-row gather removes them from the wall entirely."""
    n_levels, n_volumes, _ = prim_pool.shape
    pf = jax.lax.bitcast_convert_type(prim_pool, jnp.float32)  # (L, V, 3)
    row = jnp.concatenate(
        [pf, bias_pool, jnp.zeros((n_levels, n_volumes, 2), jnp.float32)],
        axis=-1)                                               # (L, V, 8)
    return jnp.moveaxis(row, 0, 1).reshape(n_volumes, n_levels * 8)


def _anchor_slices(ar, base):
    """Per-level flat components from the combined anchor gather.

    ar: (P, L*8) gathered rows; returns (primes (ux,uy,uz) u32,
    biases (bx,by,bz) f32) — every slice lane-contiguous and (P,)."""
    ux = jax.lax.bitcast_convert_type(ar[:, base + 0], jnp.uint32)
    uy = jax.lax.bitcast_convert_type(ar[:, base + 1], jnp.uint32)
    uz = jax.lax.bitcast_convert_type(ar[:, base + 2], jnp.uint32)
    return (ux, uy, uz), (ar[:, base + 3], ar[:, base + 4], ar[:, base + 5])


def _hash_encode_fwd(feat_pool, prim_pool, bias_pool, points, anchors,
                     packed_table: bool):
    """Anchored forward, struct-of-arrays. Returns (P, n_levels*n_channels).

    Round-4 layout rework (PERF_NOTES.md "narrow-minor-dim arrays are
    poison", applied here after proving out on the packed path):
    - ONE combined (P, L*8) anchor gather replaces 2L separate P-row
      prim/bias gathers;
    - all per-point intermediates are separate (P,) arrays (struct of
      arrays) — no (P, 3) temps (which tile T(8, 128), a 42.7x padding);
    - the table is gathered through a FLAT view with per-level index
      offsets — per-level slices of a big parent gather at the parent's
      size (the >96 MB source-size cliff);
    - ``packed_table``: table values become bf16 with adjacent channels
      bitcast-packed into one f32 lane, so a C=2 corner lookup is a scalar
      (P,)-row gather with no lane padding at all and the gather source
      halves (dodging the size cliff at the 2^21 parity shape).  The
      reference stores its tables in fp16 outright (fp16 feat pool + fp16
      atomicAdd backward, Hash3DAnchored_cuda.cu:141-155), so bf16 is
      parity-faithful.  bitcast has no gradient — this mode is only used
      under the custom-VJP wrapper (:func:`hash_encode_sorted`); the
      autodiff-able f32 mode is the golden baseline.
    """
    n_levels, local_size, n_channels = feat_pool.shape
    n_volumes = prim_pool.shape[1]
    assert local_size & (local_size - 1) == 0, "local_size must be a power of two"
    mask_mod = jnp.uint32(local_size - 1)
    n_pairs = n_channels // 2
    if packed_table:
        assert n_channels % 2 == 0, "channel-pair packing needs even C"

    valid = (anchors >= 0).astype(jnp.float32)
    vol = jnp.clip(anchors, 0, n_volumes - 1).astype(jnp.int32)  # (P,)

    scales = _level_scales(n_levels)                 # np (L,)
    ar = _anchor_table(prim_pool, bias_pool)[vol]    # (P, L*8), one gather
    if packed_table:
        # flat channel-pair-packed table: (L*local, n_pairs) f32 (each lane
        # = 2 bf16 channels); for C=2 a (L*local,) scalar column
        flat = jax.lax.bitcast_convert_type(
            feat_pool.astype(jnp.bfloat16).reshape(
                n_levels * local_size, n_pairs, 2),
            jnp.float32)                             # (L*local, n_pairs)
        if n_pairs == 1:
            flat = flat[:, 0]                        # (L*local,)
    else:
        flat = feat_pool.reshape(n_levels * local_size, n_channels)

    px, py, pz = points[:, 0], points[:, 1], points[:, 2]
    one = jnp.uint32(1)
    cols = []  # L*C separate (P,) columns, stacked once at the end
    # Unrolled python loop over levels: peak memory stays O(P) (the naive
    # (L, P, 8, 3) form OOMs at 8M+ points) and, unlike a lax.scan, lets XLA
    # overlap the gathers of different levels (~13% faster fwd on v5e).
    for l in range(n_levels):
        (ux, uy, uz), (bx, by, bz) = _anchor_slices(ar, l * 8)
        ptx = px * scales[l] + bx
        pty = py * scales[l] + by
        ptz = pz * scales[l] + bz
        x0f, y0f, z0f = jnp.floor(ptx), jnp.floor(pty), jnp.floor(ptz)
        fx, fy, fz = ptx - x0f, pty - y0f, ptz - z0f
        x0 = x0f.astype(jnp.int32).astype(jnp.uint32)
        y0 = y0f.astype(jnp.int32).astype(jnp.uint32)
        z0 = z0f.astype(jnp.int32).astype(jnp.uint32)
        hx0, hx1 = x0 * ux, (x0 + one) * ux
        hy0, hy1 = y0 * uy, (y0 + one) * uy
        hz0, hz1 = z0 * uz, (z0 + one) * uz

        acc = [jnp.zeros_like(px) for _ in range(n_channels)]
        for hx, wx in ((hx0, 1 - fx), (hx1, fx)):
            for hy, wy in ((hy0, 1 - fy), (hy1, fy)):
                for hz, wz in ((hz0, 1 - fz), (hz1, fz)):
                    idx = (((hx ^ hy ^ hz) & mask_mod).astype(jnp.int32)
                           + l * local_size)
                    w = wx * wy * wz
                    rows = flat[idx]
                    if not packed_table:
                        for c in range(n_channels):
                            acc[c] = acc[c] + w * rows[:, c]
                    elif n_pairs == 1:
                        pairs = jax.lax.bitcast_convert_type(
                            rows, jnp.bfloat16)        # (P, 2)
                        acc[0] = acc[0] + w * pairs[:, 0].astype(jnp.float32)
                        acc[1] = acc[1] + w * pairs[:, 1].astype(jnp.float32)
                    else:
                        pairs = jax.lax.bitcast_convert_type(
                            rows, jnp.bfloat16)        # (P, n_pairs, 2)
                        for p2 in range(n_pairs):
                            acc[2 * p2] = acc[2 * p2] + w * (
                                pairs[:, p2, 0].astype(jnp.float32))
                            acc[2 * p2 + 1] = acc[2 * p2 + 1] + w * (
                                pairs[:, p2, 1].astype(jnp.float32))
        cols.extend(c * valid for c in acc)
    # layout (P, L*C) matching out_feat[level*C + k] (_cuda.cu:73)
    return jnp.stack(cols, axis=-1)


def hash_encode_raw(
    feat_pool: jnp.ndarray,  # (n_levels, local_size, n_channels) float32
    prim_pool: jnp.ndarray,  # (n_levels, n_volumes, 3) uint32
    bias_pool: jnp.ndarray,  # (n_levels, n_volumes, 3) float32
    points: jnp.ndarray,     # (P, 3) float32, normalized ((warp+1.5)/3)
    anchors: jnp.ndarray,    # (P,) int32 volume index; < 0 -> masked to 0 output
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Autodiff-able f32 anchored forward (golden baseline; the production
    path is :func:`hash_encode_sorted`, whose forward uses the bf16
    pair-packed table)."""
    del compute_dtype  # always f32: this is the exactness baseline
    return _hash_encode_fwd(feat_pool, prim_pool, bias_pool, points,
                            anchors, packed_table=False)


def hash_encode(
    params: HashEncodingParams,
    points: jnp.ndarray,
    anchors: jnp.ndarray,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Convenience wrapper over :func:`hash_encode_raw`."""
    return hash_encode_raw(
        params.feat_pool, params.prim_pool, params.bias_pool,
        points, anchors, compute_dtype=compute_dtype,
    )


# ------------------------------------------------------------------------
# Sorted backward: XLA's non-unique scatter-add on TPU runs at ~19M rows/s
# (PERF_NOTES.md) — at K points x L levels x 8 corners that dominates the
# whole train step.  ``hash_encode_sorted_bwd`` replaces it with a custom
# VJP whose table gradient is built per level by:
#   1. sort the corner hashes with the weighted grads as a *payload*
#      (2 channels packed into one f32 as bf16 pairs — the reference's fp16
#      atomics have the same precision, Hash3DAnchored_cuda.cu:150),
#   2. cumsum over the sorted payload (run-sum prefix),
#   3. ONE unique-index scatter of run-end positions into the table,
#   4. dense grad = prefix-difference at those positions via gathers +
#      a monotone cummax fill (no non-unique scatter anywhere).
# ------------------------------------------------------------------------


def _corner_data_flat(local_size, prim_l, bias_l, scale_l, points, vol,
                      valid):
    """Per-level corner hashes and trilinear weights as FLAT (8P,) arrays.

    Corner-major concatenation of per-corner (P,) columns: the former
    (P, 8) form tiled T(8, 128) — its 8-lane minor dim padded 16x, a
    ~0.7 GB materialized temp per level at the parity shape — while (P,)
    columns and their (8P,) concatenation tile losslessly.  The consumer
    (sort) is order-insensitive."""
    mask_mod = jnp.uint32(local_size - 1)
    px, py, pz = points[:, 0], points[:, 1], points[:, 2]
    bias = bias_l[vol]                       # (P, 3) — single narrow gather
    prim = prim_l[vol]
    ptx = px * scale_l + bias[:, 0]
    pty = py * scale_l + bias[:, 1]
    ptz = pz * scale_l + bias[:, 2]
    x0f, y0f, z0f = jnp.floor(ptx), jnp.floor(pty), jnp.floor(ptz)
    fx, fy, fz = ptx - x0f, pty - y0f, ptz - z0f
    one = jnp.uint32(1)
    x0 = x0f.astype(jnp.int32).astype(jnp.uint32)
    y0 = y0f.astype(jnp.int32).astype(jnp.uint32)
    z0 = z0f.astype(jnp.int32).astype(jnp.uint32)
    ux, uy, uz = prim[:, 0], prim[:, 1], prim[:, 2]
    hx0, hx1 = x0 * ux, (x0 + one) * ux
    hy0, hy1 = y0 * uy, (y0 + one) * uy
    hz0, hz1 = z0 * uz, (z0 + one) * uz
    idxs, ws = [], []
    for hx, wx in ((hx0, 1 - fx), (hx1, fx)):
        for hy, wy in ((hy0, 1 - fy), (hy1, fy)):
            for hz, wz in ((hz0, 1 - fz), (hz1, fz)):
                idxs.append(((hx ^ hy ^ hz) & mask_mod).astype(jnp.int32))
                ws.append(wx * wy * wz * valid)
    return jnp.concatenate(idxs), jnp.concatenate(ws)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def hash_encode_sorted(feat_pool, prim_pool, bias_pool, points, anchors):
    return _hash_encode_fwd(feat_pool, prim_pool, bias_pool, points,
                            anchors, packed_table=feat_pool.shape[2] % 2 == 0)


def _hes_fwd(feat_pool, prim_pool, bias_pool, points, anchors):
    out = _hash_encode_fwd(feat_pool, prim_pool, bias_pool, points, anchors,
                           packed_table=feat_pool.shape[2] % 2 == 0)
    return out, (feat_pool.shape, prim_pool, bias_pool, points, anchors)


def _hes_bwd(res, g):
    feat_shape, prim_pool, bias_pool, points, anchors = res
    n_levels, local_size, n_channels = feat_shape
    assert n_channels % 2 == 0, "sorted bwd packs bf16 channel pairs"
    n_volumes = prim_pool.shape[1]
    p_count = points.shape[0]
    valid = (anchors >= 0).astype(points.dtype)
    vol = jnp.clip(anchors, 0, n_volumes - 1).astype(jnp.int32)
    scales = jnp.asarray(_level_scales(n_levels))
    g = g.reshape(p_count, n_levels, n_channels)
    n_pairs = n_channels // 2

    def level_fn(carry, xs):
        prim_l, bias_l, scale_l, g_l = xs
        idx, w = _corner_data_flat(local_size, prim_l, bias_l, scale_l,
                                   points, vol, valid)
        # weighted grads per channel, packed as bf16 pairs into f32 payloads
        # (corner-major flat order, matching _corner_data_flat)
        payloads = []
        for p2 in range(n_pairs):
            wv0 = w * jnp.tile(g_l[:, 2 * p2], 8)
            wv1 = w * jnp.tile(g_l[:, 2 * p2 + 1], 8)
            payloads.append(jax.lax.bitcast_convert_type(
                jnp.stack([wv0.astype(jnp.bfloat16),
                           wv1.astype(jnp.bfloat16)], -1), jnp.float32))
        sorted_ops = jax.lax.sort((idx, *payloads),
                                  dimension=0, num_keys=1)
        skeys = sorted_ops[0]
        sv = jnp.concatenate(
            [jax.lax.bitcast_convert_type(sp, jnp.bfloat16)
             for sp in sorted_ops[1:]], axis=-1)   # (K8, C)
        prefix = jnp.cumsum(sv.astype(jnp.float32), axis=0)       # (K8, C)
        # run-end diff via one binary search (no K8-row scatter; see
        # packed_hash._runend_diff for the rate analysis)
        from gfnerf_tpu.fields.packed_hash import _runend_diff

        dense = _runend_diff(skeys, prefix, local_size)
        return carry, dense

    _, grads = jax.lax.scan(
        level_fn, None,
        (prim_pool, bias_pool, scales,
         jnp.moveaxis(g, 1, 0)),  # (L, P, C)
    )
    return (grads, None, None, None, None)


hash_encode_sorted.defvjp(_hes_fwd, _hes_bwd)


@functools.partial(jax.jit, static_argnames=())
def hash_encode_jit(params, points, anchors):
    return hash_encode(params, points, anchors)
