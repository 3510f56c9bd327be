"""Activation functions.

``trunc_exp`` ports ``nerfstudio/field_components/activations.py``: exp in the
forward pass, gradient computed with the input clamped to [-15, 15] so large
densities don't blow up the backward pass.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def trunc_exp(x):
    return jnp.exp(x)


def _trunc_exp_fwd(x):
    return jnp.exp(x), x


def _trunc_exp_bwd(x, g):
    return (g * jnp.exp(jnp.clip(x, -15.0, 15.0)),)


trunc_exp.defvjp(_trunc_exp_fwd, _trunc_exp_bwd)
