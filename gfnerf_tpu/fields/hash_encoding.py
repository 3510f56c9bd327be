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


# The 8 cube-corner offsets in (x, y, z), matching the pos_abc order of
# _cuda.cu:48-55 (corner k has bits [z=k&1, y=(k>>1)&1, x=(k>>2)&1]).
_CORNERS = np.array(
    [
        [0, 0, 0], [0, 0, 1], [0, 1, 0], [0, 1, 1],
        [1, 0, 0], [1, 0, 1], [1, 1, 0], [1, 1, 1],
    ],
    dtype=np.uint32,
)


def hash_encode_raw(
    feat_pool: jnp.ndarray,  # (n_levels, local_size, n_channels) float32
    prim_pool: jnp.ndarray,  # (n_levels, n_volumes, 3) uint32
    bias_pool: jnp.ndarray,  # (n_levels, n_volumes, 3) float32
    points: jnp.ndarray,     # (P, 3) float32, normalized ((warp+1.5)/3)
    anchors: jnp.ndarray,    # (P,) int32 volume index; < 0 -> masked to 0 output
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Forward anchored hash encoding. Returns (P, n_levels*n_channels)."""
    n_levels, local_size, n_channels = feat_pool.shape
    n_volumes = prim_pool.shape[1]
    assert local_size & (local_size - 1) == 0, "local_size must be a power of two"
    mask_mod = jnp.uint32(local_size - 1)

    valid = anchors >= 0
    vol = jnp.clip(anchors, 0, n_volumes - 1).astype(jnp.int32)  # (P,)

    scales = jnp.asarray(_level_scales(n_levels))  # (L,)

    # Unrolled python loop over levels: peak memory stays O(P) (the naive
    # (L, P, 8, 3) form OOMs at 8M+ points) and, unlike a lax.scan, lets XLA
    # overlap the gathers of different levels (~13% faster fwd on v5e).
    vmask = valid[:, None]
    outs = []
    for l in range(n_levels):
        pt = points * scales[l] + bias_pool[l][vol]   # (P, 3)
        pos_f = jnp.floor(pt)
        frac = pt - pos_f                             # (P, 3)
        pos = pos_f.astype(jnp.int32).astype(jnp.uint32)
        prim = prim_pool[l][vol]                      # (P, 3) uint32

        hx0 = pos[:, 0] * prim[:, 0]
        hy0 = pos[:, 1] * prim[:, 1]
        hz0 = pos[:, 2] * prim[:, 2]
        hx1 = (pos[:, 0] + jnp.uint32(1)) * prim[:, 0]
        hy1 = (pos[:, 1] + jnp.uint32(1)) * prim[:, 1]
        hz1 = (pos[:, 2] + jnp.uint32(1)) * prim[:, 2]
        fx, fy, fz = frac[:, 0], frac[:, 1], frac[:, 2]

        out_l = jnp.zeros((points.shape[0], n_channels), compute_dtype)
        feat_c = feat_pool[l].astype(compute_dtype)
        for hx, wx in ((hx0, 1 - fx), (hx1, fx)):
            for hy, wy in ((hy0, 1 - fy), (hy1, fy)):
                for hz, wz in ((hz0, 1 - fz), (hz1, fz)):
                    idx = ((hx ^ hy ^ hz) & mask_mod).astype(jnp.int32)
                    w = (wx * wy * wz).astype(compute_dtype)
                    out_l = out_l + feat_c[idx] * w[:, None]
        outs.append(out_l * vmask)
    # layout (P, L*C) matching out_feat[level*C + k] (_cuda.cu:73)
    out = jnp.concatenate(outs, axis=-1)
    return out.astype(jnp.float32)


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


def _corner_data(feat_shape, prim_l, bias_l, scale_l, points, vol, valid):
    """Per-level corner indices (P, 8) and trilinear weights (P, 8)."""
    local_size = feat_shape[0]
    mask_mod = jnp.uint32(local_size - 1)
    pt = points * scale_l + bias_l[vol]
    pos_f = jnp.floor(pt)
    frac = pt - pos_f
    pos = pos_f.astype(jnp.int32).astype(jnp.uint32)
    prim = prim_l[vol]
    hx = jnp.stack([pos[:, 0] * prim[:, 0],
                    (pos[:, 0] + jnp.uint32(1)) * prim[:, 0]], -1)
    hy = jnp.stack([pos[:, 1] * prim[:, 1],
                    (pos[:, 1] + jnp.uint32(1)) * prim[:, 1]], -1)
    hz = jnp.stack([pos[:, 2] * prim[:, 2],
                    (pos[:, 2] + jnp.uint32(1)) * prim[:, 2]], -1)
    corners = _CORNERS  # (8, 3) bit pattern (x, y, z)
    idx = ((hx[:, corners[:, 0]] ^ hy[:, corners[:, 1]]
            ^ hz[:, corners[:, 2]]) & mask_mod).astype(jnp.int32)  # (P, 8)
    f = frac[:, None, :]
    c = corners[None, :, :].astype(points.dtype)
    w = jnp.prod(f * c + (1.0 - f) * (1.0 - c), axis=-1)  # (P, 8)
    w = w * valid[:, None]
    return idx, w


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def hash_encode_sorted(feat_pool, prim_pool, bias_pool, points, anchors):
    return hash_encode_raw(feat_pool, prim_pool, bias_pool, points, anchors)


def _hes_fwd(feat_pool, prim_pool, bias_pool, points, anchors):
    out = hash_encode_raw(feat_pool, prim_pool, bias_pool, points, anchors)
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
        idx, w = _corner_data((local_size,), prim_l, bias_l, scale_l,
                              points, vol, valid)
        # weighted grads per channel, packed as bf16 pairs into f32 payloads
        payloads = []
        for p2 in range(n_pairs):
            wv0 = (w * g_l[:, 2 * p2: 2 * p2 + 1]).reshape(-1)
            wv1 = (w * g_l[:, 2 * p2 + 1: 2 * p2 + 2]).reshape(-1)
            payloads.append(jax.lax.bitcast_convert_type(
                jnp.stack([wv0.astype(jnp.bfloat16),
                           wv1.astype(jnp.bfloat16)], -1), jnp.float32))
        sorted_ops = jax.lax.sort((idx.reshape(-1), *payloads),
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
