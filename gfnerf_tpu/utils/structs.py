"""Lightweight pytree struct helpers.

The reference framework builds on nerfstudio's ``TensorDataclass``
(``nerfstudio/utils/tensor_dataclass.py``) which provides broadcasting /
indexing over torch tensors.  In JAX the idiomatic equivalent is a frozen
dataclass registered as a pytree; jit/vmap/shard all understand it natively,
so no bespoke broadcast machinery is required.  We use ``flax.struct`` and add
a few small conveniences.
"""

from __future__ import annotations

from typing import Any

import flax.struct as struct
import jax
import jax.numpy as jnp

# Re-export so model code imports from one place.
dataclass = struct.dataclass
field = struct.field


def static_field(**kwargs):
    """A field ignored by pytree flattening (static / auxiliary data)."""
    return struct.field(pytree_node=False, **kwargs)


def tree_slice(tree: Any, idx) -> Any:
    """Index every array leaf of a pytree with the same index expression."""
    return jax.tree_util.tree_map(lambda x: x[idx], tree)


def tree_concat(trees, axis: int = 0) -> Any:
    """Concatenate matching leaves of a list of pytrees."""
    return jax.tree_util.tree_map(lambda *xs: jnp.concatenate(xs, axis=axis), *trees)


def tree_stack(trees, axis: int = 0) -> Any:
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=axis), *trees)
