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

    # (L, P, 3): scaled + per-(level, volume)-biased points
    pt = points[None, :, :] * scales[:, None, None]
    pt = pt + jnp.take_along_axis(
        bias_pool, vol[None, :, None].astype(jnp.int32), axis=1
    )  # bias_pool (L, V, 3) gathered at vol -> (L, P, 3)

    pos_f = jnp.floor(pt)
    frac = pt - pos_f                      # (L, P, 3) in [0, 1)
    pos = pos_f.astype(jnp.int32).astype(jnp.uint32)  # (L, P, 3)

    prim = jnp.take_along_axis(
        prim_pool, vol[None, :, None].astype(jnp.int32), axis=1
    )  # (L, P, 3) uint32

    # corner coords (L, P, 8, 3) and their hashes
    corner = pos[:, :, None, :] + _CORNERS[None, None, :, :]
    h = corner * prim[:, :, None, :]       # uint32 wraparound multiply
    idx = (h[..., 0] ^ h[..., 1] ^ h[..., 2]) & mask_mod   # (L, P, 8)

    # trilinear weights: w_corner = prod over axes of frac or (1 - frac)
    f = frac[:, :, None, :]               # (L, P, 1, 3)
    c = _CORNERS[None, None, :, :].astype(points.dtype)
    w = jnp.prod(f * c + (1.0 - f) * (1.0 - c), axis=-1)   # (L, P, 8)

    # gather features: flat pool (L*local, C), offset indices per level
    flat = feat_pool.reshape(n_levels * local_size, n_channels)
    level_off = (jnp.arange(n_levels, dtype=jnp.uint32) * jnp.uint32(local_size))
    gidx = (idx + level_off[:, None, None]).astype(jnp.int32)  # (L, P, 8)
    feats = flat.astype(compute_dtype)[gidx]                # (L, P, 8, C)

    out = jnp.sum(feats * w.astype(compute_dtype)[..., None], axis=2)  # (L, P, C)
    out = out * valid[None, :, None]
    # layout (P, L*C) matching out_feat[level*C + k] (_cuda.cu:73)
    out = jnp.transpose(out, (1, 0, 2)).reshape(points.shape[0], n_levels * n_channels)
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


@functools.partial(jax.jit, static_argnames=())
def hash_encode_jit(params, points, anchors):
    return hash_encode(params, points, anchors)
