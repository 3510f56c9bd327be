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

import jax
import jax.numpy as jnp
import numpy as np

TILE_R = 8


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


def _composite_pallas(densities, dts, ts, rgbs):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    r, s = densities.shape
    assert r % TILE_R == 0 and (s & (s - 1)) == 0, (r, s)
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
    return outs


@jax.custom_vjp
def fused_composite(densities, dts, ts, rgbs):
    """(weights, alphas, rgb, acc, depth) from (R,S) samples.

    Pallas on TPU, jnp reference elsewhere; backward always via the jnp
    formulation (XLA fuses it well).
    """
    if jax.default_backend() in ("tpu",) or _on_tpu():
        try:
            return _composite_pallas(densities, dts, ts, rgbs)
        except Exception:
            pass
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
    densities, dts, ts, rgbs = res
    _, vjp = jax.vjp(_composite_reference, densities, dts, ts, rgbs)
    return vjp(g)


fused_composite.defvjp(_fwd, _bwd)
