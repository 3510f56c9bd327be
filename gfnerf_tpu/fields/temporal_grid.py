"""Time-conditioned multi-resolution grid encoding (NeRFPlayer, N9).

TPU-native equivalent of the reference's CUDA ``temporal_gridencoder``
(``nerfstudio/field_components/cuda/csrc/temporal_gridencoder.cu:1-667``) and
its wrapper ``TemporalGridEncoder``
(``nerfstudio/field_components/temporal_grid.py:159-356``).

The table stores ``level_dim + temporal_dim`` channels per grid vertex.  A
time value selects a *sliding window* of ``level_dim`` output channels: at
temporal row r, one window position interpolates between an old and a new
stored channel (weights 1-frac / frac) while the others pass through — so
consecutive times differ in exactly one channel and the representation
morphs continuously (temporal_grid.py:232-307 describes the same scheme
through its index bookkeeping; here it is expressed directly as the
window recurrence: ``active[r % C]`` is replaced by the next unused stored
channel at each row).

Spatial addressing follows instant-NGP: per-level resolution
``ceil(base * scale^l)``, dense (tiled) indexing while the vertex count fits
the table cap, XOR-prime hashing above it.  Interpolation places the cell at
``xyz * res`` (the reference's align_corners=False places vertices at texel
centers — a half-texel shift that only relabels vertices; documented
difference).

Gradients flow to ``embeddings`` through XLA's native gather VJP; this
family is not the perf flagship, so the packed-row machinery of
``packed_hash.py`` is not replicated here.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

_PRIMES = (1, 2654435761, 805459861)  # instant-NGP / torch-ngp spatial primes


@dataclasses.dataclass
class TemporalGridStatics:
    """Fixed addressing + channel-window tables (host-built)."""

    offsets: np.ndarray        # (L+1,) int — row offset per level
    resolutions: np.ndarray    # (L,) int
    hashed: np.ndarray         # (L,) bool — level uses hashing vs dense
    sel_pass: np.ndarray       # (T-1, C) int — passthrough channel per slot
    sel_old: np.ndarray        # (T-1,) int — interpolation source channel
    sel_new: np.ndarray        # (T-1,) int — interpolation target channel
    interp_pos: np.ndarray     # (T-1,) int — which slot interpolates
    level_dim: int = 2
    temporal_dim: int = 64


def make_temporal_grid(
    seed: int,
    temporal_dim: int = 64,
    num_levels: int = 16,
    level_dim: int = 2,
    base_resolution: int = 16,
    log2_hashmap_size: int = 19,
    desired_resolution: int | None = None,
    per_level_scale: float = 2.0,
):
    """Returns (embeddings (rows, level_dim + temporal_dim) f32, statics)."""
    if desired_resolution is not None:
        per_level_scale = float(np.exp2(
            np.log2(desired_resolution / base_resolution)
            / max(num_levels - 1, 1)))
    cap = 1 << log2_hashmap_size
    offsets, resolutions, hashed = [0], [], []
    for l in range(num_levels):
        res = int(math.ceil(base_resolution * per_level_scale ** l))
        verts = (res + 1) ** 3
        n = min(cap, verts)
        n = int(math.ceil(n / 8) * 8)
        resolutions.append(res)
        hashed.append(verts > cap)
        offsets.append(offsets[-1] + n)

    # sliding-window channel tables: row r replaces active[r % C] with the
    # next unused stored channel (see module docstring)
    C, T = level_dim, temporal_dim
    active = list(range(C))
    sel_pass, sel_old, sel_new, interp_pos = [], [], [], []
    nxt = C
    for r in range(max(T - 1, 1)):
        pos = r % C
        sel_old.append(active[pos])
        sel_new.append(nxt)
        interp_pos.append(pos)
        row = list(active)
        sel_pass.append(row)
        active[pos] = nxt
        nxt += 1

    rng = np.random.default_rng(seed)
    emb = rng.uniform(-1e-4, 1e-4,
                      (offsets[-1], level_dim + temporal_dim)).astype(
        np.float32)  # temporal_grid.py:253 (std 1e-4)
    statics = TemporalGridStatics(
        offsets=np.asarray(offsets, np.int64),
        resolutions=np.asarray(resolutions, np.int32),
        hashed=np.asarray(hashed, bool),
        sel_pass=np.asarray(sel_pass, np.int32),
        sel_old=np.asarray(sel_old, np.int32),
        sel_new=np.asarray(sel_new, np.int32),
        interp_pos=np.asarray(interp_pos, np.int32),
        level_dim=level_dim,
        temporal_dim=temporal_dim,
    )
    return jnp.asarray(emb), statics


def temporal_grid_encode(
    embeddings: jnp.ndarray,        # (rows, level_dim + temporal_dim)
    statics: TemporalGridStatics,
    xyz: jnp.ndarray,               # (P, 3) in [0, 1]
    times: jnp.ndarray,             # (P,) in [0, 1]
) -> jnp.ndarray:
    """Returns (P, num_levels * level_dim)."""
    P = xyz.shape[0]
    C = statics.level_dim
    T = statics.temporal_dim
    n_rows_tbl = max(T - 1, 1)

    # time -> window row + interpolation fraction (temporal_grid.py:319-330)
    val = jnp.clip(times, 0.0, 1.0) * max(T - 2, 1)
    row = jnp.minimum(val.astype(jnp.int32), n_rows_tbl - 1)
    frac_t = val - row

    sel_pass = jnp.asarray(statics.sel_pass)[row]       # (P, C)
    sel_old = jnp.asarray(statics.sel_old)[row]         # (P,)
    sel_new = jnp.asarray(statics.sel_new)[row]
    ipos = jnp.asarray(statics.interp_pos)[row]         # (P,)

    outs = []
    for l, (res, off, is_hashed) in enumerate(zip(
            statics.resolutions, statics.offsets[:-1], statics.hashed)):
        n_level = int(statics.offsets[l + 1] - off)
        pos = xyz * float(res)
        cell = jnp.floor(pos).astype(jnp.int32)
        frac = pos - jnp.floor(pos)
        acc = jnp.zeros((P, C), jnp.float32)
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    cx = jnp.clip(cell[:, 0] + dx, 0, res)
                    cy = jnp.clip(cell[:, 1] + dy, 0, res)
                    cz = jnp.clip(cell[:, 2] + dz, 0, res)
                    if is_hashed:
                        idx = ((cx.astype(jnp.uint32) * jnp.uint32(_PRIMES[0]))
                               ^ (cy.astype(jnp.uint32) * jnp.uint32(_PRIMES[1]))
                               ^ (cz.astype(jnp.uint32) * jnp.uint32(_PRIMES[2])))
                        idx = (idx % jnp.uint32(n_level)).astype(jnp.int32)
                    else:
                        idx = cx + (res + 1) * (cy + (res + 1) * cz)
                    w = ((frac[:, 0] if dx else 1 - frac[:, 0])
                         * (frac[:, 1] if dy else 1 - frac[:, 1])
                         * (frac[:, 2] if dz else 1 - frac[:, 2]))
                    rows_l = embeddings[int(off) + idx]   # (P, C + T)
                    # channel window: passthrough slots + one interpolated
                    passed = jnp.take_along_axis(rows_l, sel_pass, axis=1)
                    old = jnp.take_along_axis(rows_l, sel_old[:, None],
                                              axis=1)[:, 0]
                    new = jnp.take_along_axis(rows_l, sel_new[:, None],
                                              axis=1)[:, 0]
                    mixed = (1.0 - frac_t) * old + frac_t * new
                    feat = jnp.where(
                        jnp.arange(C)[None, :] == ipos[:, None],
                        mixed[:, None], passed)
                    acc = acc + w[:, None] * feat
        outs.append(acc)
    return jnp.concatenate(outs, axis=-1)


def temporal_tv_loss(embeddings: jnp.ndarray, statics: TemporalGridStatics,
                     rng: jax.Array) -> jnp.ndarray:
    """TV regularizer over adjacent temporal channels
    (temporal_grid.py:349-356): mean |emb[:, old] - emb[:, new]| for a random
    window row."""
    n = statics.sel_old.shape[0]
    r = jax.random.randint(rng, (), 0, n)
    old = jnp.asarray(statics.sel_old)[r]
    new = jnp.asarray(statics.sel_new)[r]
    return jnp.abs(embeddings[:, old] - embeddings[:, new]).mean()
