"""Fused volume-rendering compositing as a Pallas TPU kernel.

Computes, in one VMEM pass over the samples axis, what the reference
composes from several torch ops (``get_weights_f2nerf`` rays.py:178-200 +
RGB/accumulation/expected-depth renderers):

    alpha_i = 1 - exp(-sigma_i * dt_i)
    T_i     = exp(-prefix_excl(sigma * dt))
    w_i     = alpha_i * T_i
    rgb     = sum w_i c_i ; acc = sum w_i ; depth = sum w_i t_i / (acc+eps)

The exclusive prefix sum along the (lane-dim) samples axis is a
Hillis-Steele scan built from ``pltpu.roll`` — log2(S) shift+add passes, all
(TILE_R, S) vector ops.  Grid tiles the ray axis.  The op carries a custom
VJP whose backward runs the (cheap) jnp reference formulation, so it is
drop-in for training.

``fused_composite`` falls back to the pure-jnp path off-TPU (tests run on
CPU) and is validated against it in tests/test_pallas_ops.py.
"""

from __future__ import annotations

import functools
import warnings

import jax
import jax.numpy as jnp
import numpy as np

TILE_R = 8

# Pad ratio (next_pow2(S)/S) is always in [1, 2).  Above this threshold the
# padded-fused kernel's extra compute/VMEM is assumed to lose to the jnp
# fallback and we skip the Pallas path.  S=384 pads to 512 (ratio 1.33,
# kept); worst case S=2^k+1 (ratio ~2) falls back.
MAX_PAD_RATIO = 1.6
_PAD_LOGGED: set = set()


def _log_pad_once(s, s_pad, where):
    key = (s, s_pad, where)
    if s != s_pad and key not in _PAD_LOGGED:
        _PAD_LOGGED.add(key)
        print(f"[pallas composite] {where}: samples axis {s} zero-padded to "
              f"{s_pad} (x{s_pad / s:.2f} kernel compute; exact, see _pad_s)")


def _pad_s(x, s_pad):
    """Zero-pad the samples (last) axis up to s_pad.

    Exact for this op: padded slots have density=0 and dt=0, hence
    dd=0, alpha=0, weight=0 — every reduction (rgb/acc/depth), the
    prefix/suffix scans, and every gradient output (each multiplied by
    w, dts, or dens, all zero at pads) are unaffected.
    """
    s = x.shape[1]
    if s == s_pad:
        return x
    return jnp.pad(x, ((0, 0), (0, s_pad - s)))


def _composite_reference(densities, dts, ts, rgbs):
    """Pure-jnp reference (identical math to cameras.rays +
    model_components.renderers)."""
    delta_density = dts * densities
    alphas = 1.0 - jnp.exp(-delta_density)
    accum = jnp.cumsum(delta_density, axis=-1)
    accum = jnp.concatenate(
        [jnp.zeros_like(accum[..., :1]), accum[..., :-1]], axis=-1)
    trans = jnp.exp(-accum)
    weights = jnp.nan_to_num(alphas * trans)
    rgb = jnp.sum(weights[..., None] * rgbs, axis=-2)
    acc = jnp.sum(weights, axis=-1, keepdims=True)
    depth = jnp.nan_to_num(
        jnp.sum(weights * ts, axis=-1, keepdims=True) / (acc + 1e-10))
    return weights, alphas, rgb, acc, depth


def _kernel(dens_ref, dts_ref, ts_ref, r_ref, g_ref, b_ref,
            w_ref, a_ref, rgb_ref, acc_ref, depth_ref):
    from jax.experimental.pallas import tpu as pltpu

    s = dens_ref.shape[1]
    dd = dens_ref[:] * dts_ref[:]                  # (TILE_R, S)
    alphas = 1.0 - jnp.exp(-dd)

    # inclusive prefix sum along axis 1 (Hillis-Steele with roll + mask)
    prefix = dd
    col = jax.lax.broadcasted_iota(jnp.int32, (TILE_R, s), 1)
    shift = 1
    while shift < s:
        rolled = pltpu.roll(prefix, shift, 1)
        prefix = prefix + jnp.where(col >= shift, rolled, 0.0)
        shift *= 2
    excl = prefix - dd                             # exclusive prefix
    trans = jnp.exp(-excl)
    w = alphas * trans

    w_ref[:] = w
    a_ref[:] = alphas
    acc = jnp.sum(w, axis=1, keepdims=True)
    acc_ref[:] = acc
    rgb_ref[:] = jnp.concatenate([
        jnp.sum(w * r_ref[:], axis=1, keepdims=True),
        jnp.sum(w * g_ref[:], axis=1, keepdims=True),
        jnp.sum(w * b_ref[:], axis=1, keepdims=True),
    ], axis=1)
    depth_ref[:] = jnp.sum(w * ts_ref[:], axis=1, keepdims=True) / (acc + 1e-10)


def _bwd_kernel(dens_ref, dts_ref, ts_ref, r_ref, g_ref, b_ref,
                gw_ref, ga_ref, grgb_ref, gacc_ref, gdepth_ref,
                gdens_ref, gdts_ref, gts_ref, gr_ref, gg_ref, gb_ref):
    """Whole composite VJP in one VMEM pass per ray tile.

    Recomputes the transmittance chain (forward Hillis-Steele prefix), then
    folds every output cotangent (weights, alphas, rgb, acc, depth) into
    g_density/g_dt/g_t/g_rgb with one reverse (suffix) scan — replacing the
    ~15-op jnp vjp chain XLA otherwise materializes over (R, S) arrays.
    """
    from jax.experimental.pallas import tpu as pltpu

    s = dens_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, dens_ref.shape, 1)

    dd = dens_ref[:] * dts_ref[:]
    alphas = 1.0 - jnp.exp(-dd)
    prefix = dd
    shift = 1
    while shift < s:
        rolled = pltpu.roll(prefix, shift, 1)
        prefix = prefix + jnp.where(col >= shift, rolled, 0.0)
        shift *= 2
    trans = jnp.exp(-(prefix - dd))                # T_i
    w = alphas * trans
    ts = ts_ref[:]
    acc = jnp.sum(w, axis=1, keepdims=True)
    a_eps = acc + 1e-10
    depth = jnp.sum(w * ts, axis=1, keepdims=True) / a_eps

    # total dL/dw_i: direct + rgb/acc/depth render paths
    gw_tot = (gw_ref[:]
              + grgb_ref[:, 0:1] * r_ref[:]
              + grgb_ref[:, 1:2] * g_ref[:]
              + grgb_ref[:, 2:3] * b_ref[:]
              + gacc_ref[:]
              + gdepth_ref[:] * (ts - depth) / a_eps)

    # w_i = alpha_i * T_i ; T_i = exp(-sum_{j<i} dd_j)
    g_alpha = ga_ref[:] + gw_tot * trans
    g_excl = -w * gw_tot                           # dL/dE_i
    # dd_j feeds E_i for every i > j: exclusive suffix sum of g_excl
    sfx = g_excl
    shift = 1
    while shift < s:
        rolled = pltpu.roll(sfx, s - shift, 1)      # rotate by -shift mod s
        sfx = sfx + jnp.where(col < s - shift, rolled, 0.0)
        shift *= 2                                  # inclusive suffix
    g_dd = g_alpha * (1.0 - alphas) + (sfx - g_excl)
    gdens_ref[:] = g_dd * dts_ref[:]
    gdts_ref[:] = g_dd * dens_ref[:]
    gts_ref[:] = gdepth_ref[:] * w / a_eps
    gr_ref[:] = grgb_ref[:, 0:1] * w
    gg_ref[:] = grgb_ref[:, 1:2] * w
    gb_ref[:] = grgb_ref[:, 2:3] * w


def _composite_bwd_pallas(densities, dts, ts, rgbs, g, interpret=False):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    gw, ga, grgb, gacc, gdepth = g
    r, s = densities.shape
    s_pad = 1 << (s - 1).bit_length()
    _log_pad_once(s, s_pad, "bwd")
    if s_pad != s:
        densities, dts, ts, gw, ga = (
            _pad_s(x, s_pad) for x in (densities, dts, ts, gw, ga))
        rgbs = jnp.pad(rgbs, ((0, 0), (0, s_pad - s), (0, 0)))
    orig_s, s = s, s_pad

    def spec(cols):
        return pl.BlockSpec((TILE_R, cols), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    rs = jax.ShapeDtypeStruct((r, s), jnp.float32)
    outs = pl.pallas_call(
        _bwd_kernel,
        grid=(r // TILE_R,),
        in_specs=[spec(s)] * 6 + [spec(s), spec(s), spec(3), spec(1),
                                  spec(1)],
        out_specs=tuple(spec(s) for _ in range(6)),
        out_shape=tuple(rs for _ in range(6)),
        interpret=interpret,
    )(densities, dts, ts, rgbs[..., 0], rgbs[..., 1], rgbs[..., 2],
      gw, ga, grgb, gacc, gdepth)
    g_dens, g_dts, g_ts, gr, gg, gb = outs
    if orig_s != s:
        g_dens, g_dts, g_ts, gr, gg, gb = (
            x[:, :orig_s] for x in (g_dens, g_dts, g_ts, gr, gg, gb))
    return g_dens, g_dts, g_ts, jnp.stack([gr, gg, gb], axis=-1)


def _composite_pallas(densities, dts, ts, rgbs):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    r, s = densities.shape
    assert r % TILE_R == 0, (r, s)
    s_pad = 1 << (s - 1).bit_length()              # next pow2 (scan needs it)
    _log_pad_once(s, s_pad, "fwd")
    if s_pad != s:
        densities, dts, ts = (_pad_s(x, s_pad) for x in (densities, dts, ts))
        rgbs = jnp.pad(rgbs, ((0, 0), (0, s_pad - s), (0, 0)))
    orig_s, s = s, s_pad
    grid = (r // TILE_R,)

    def spec(cols):
        return pl.BlockSpec((TILE_R, cols), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[spec(s)] * 6,
        out_specs=(spec(s), spec(s), spec(3), spec(1), spec(1)),
        out_shape=(
            jax.ShapeDtypeStruct((r, s), jnp.float32),
            jax.ShapeDtypeStruct((r, s), jnp.float32),
            jax.ShapeDtypeStruct((r, 3), jnp.float32),
            jax.ShapeDtypeStruct((r, 1), jnp.float32),
            jax.ShapeDtypeStruct((r, 1), jnp.float32),
        ),
    )(densities, dts, ts, rgbs[..., 0], rgbs[..., 1], rgbs[..., 2])
    if orig_s != s:
        w, a, rgb, acc, depth = outs
        outs = (w[:, :orig_s], a[:, :orig_s], rgb, acc, depth)
    return outs


# Tri-state kernel availability, decided once per process: None = untried,
# True = Pallas path works, False = it raised (warned once, jnp fallback
# thereafter).  Avoids re-raising + swallowing the same exception every step,
# which hid both the error and the resulting perf regression.
_PALLAS_FWD_OK: "bool | None" = None
_PALLAS_BWD_OK: "bool | None" = None


@jax.custom_vjp
def fused_composite(densities, dts, ts, rgbs):
    """(weights, alphas, rgb, acc, depth) from (R,S) samples.

    Pallas on TPU, jnp reference elsewhere; backward via the fused Pallas
    VJP when shapes allow, else the jnp formulation (XLA fuses it well).
    """
    global _PALLAS_FWD_OK
    s = densities.shape[1]
    if (jax.default_backend() in ("tpu",) or _on_tpu()) and \
            (1 << (s - 1).bit_length()) <= s * MAX_PAD_RATIO and \
            _PALLAS_FWD_OK is not False:
        try:
            out = _composite_pallas(densities, dts, ts, rgbs)
            _PALLAS_FWD_OK = True
            return out
        except Exception as e:
            _PALLAS_FWD_OK = False
            warnings.warn(
                f"Pallas composite forward unavailable, using jnp fallback "
                f"(slower): {type(e).__name__}: {e}")
    return _composite_reference(densities, dts, ts, rgbs)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _fwd(densities, dts, ts, rgbs):
    out = fused_composite(densities, dts, ts, rgbs)
    return out, (densities, dts, ts, rgbs)


def _bwd(res, g):
    global _PALLAS_BWD_OK
    densities, dts, ts, rgbs = res
    r, s = densities.shape
    if (_on_tpu() and r % TILE_R == 0
            and (1 << (s - 1).bit_length()) <= s * MAX_PAD_RATIO
            and _PALLAS_BWD_OK is not False):
        try:
            out = _composite_bwd_pallas(densities, dts, ts, rgbs, g)
            _PALLAS_BWD_OK = True
            return out
        except Exception as e:
            _PALLAS_BWD_OK = False
            warnings.warn(
                f"Pallas composite backward unavailable, using jnp VJP "
                f"(slower): {type(e).__name__}: {e}")
    _, vjp = jax.vjp(_composite_reference, densities, dts, ts, rgbs)
    return vjp(g)


fused_composite.defvjp(_fwd, _bwd)
