"""Plain MLP as param pytrees + apply functions.

Equivalent of the reference's ``MLPNetwork`` (``gfnerf/mlp.py:3-57``), a
torch Linear+ReLU stack matching the tcnn FullyFusedMLP config interface.
On TPU these are bare jnp.dot chains — XLA fuses the activation into the
matmul epilogue, and batch dims are large enough to keep the MXU busy.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def init_mlp(
    rng: np.random.Generator,
    n_input: int,
    n_output: int,
    hidden: int,
    n_hidden_layers: int,
):
    """Kaiming-uniform init (torch.nn.Linear default) for a ReLU MLP.

    Returns a dict {"w": [W0, W1, ...], "b": [b0, ...]} with W stored (in, out).
    """
    dims = [n_input] + [hidden] * n_hidden_layers + [n_output]
    ws, bs = [], []
    for i in range(len(dims) - 1):
        fan_in = dims[i]
        bound_w = float(np.sqrt(6.0 / fan_in) / np.sqrt(2.0)) * np.sqrt(2.0)
        # torch default: U(-sqrt(1/fan_in)*sqrt(3)*gain..) simplifies to
        # U(-1/sqrt(fan_in), 1/sqrt(fan_in)) * sqrt(3) for weight (a=sqrt(5)).
        bound_w = float(np.sqrt(1.0 / fan_in))
        w = rng.uniform(-bound_w * np.sqrt(3.0), bound_w * np.sqrt(3.0),
                        (dims[i], dims[i + 1])).astype(np.float32)
        b = rng.uniform(-bound_w, bound_w, (dims[i + 1],)).astype(np.float32)
        ws.append(jnp.asarray(w))
        bs.append(jnp.asarray(b))
    return {"w": ws, "b": bs}


def apply_mlp(
    params,
    x: jnp.ndarray,
    output_activation: str = "none",
    compute_dtype=jnp.float32,
    start_layer: int = 0,
) -> jnp.ndarray:
    """ReLU MLP forward. ``output_activation``: "none" | "sigmoid".

    Hidden activations stay in ``compute_dtype`` between layers (the MXU
    accumulates f32 internally either way; bf16 activations halve the HBM
    traffic of the (N, hidden) intermediates — the fp16-tcnn-class compute
    the reference uses).  The final layer accumulates and returns f32.

    ``start_layer``: skip the first layers — the caller supplies ``x`` as
    that layer's pre-activation (used by the split color head, field.py).
    """
    ws, bs = params["w"], params["b"]
    n = len(ws)
    if start_layer > 0:
        h = jax.nn.relu(x).astype(compute_dtype)
    else:
        h = x.astype(compute_dtype)
    for i in range(start_layer, n):
        last = i == n - 1
        h = jnp.dot(h, ws[i].astype(compute_dtype),
                    preferred_element_type=(jnp.float32 if last
                                            else compute_dtype))
        h = h + bs[i].astype(h.dtype)
        if not last:
            h = jax.nn.relu(h)
    if output_activation == "sigmoid":
        h = jax.nn.sigmoid(h)
    return h.astype(jnp.float32)
