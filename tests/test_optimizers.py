"""Optimizer behavior: residual-table weight decay (QUALITY.md finding 4)."""

import jax.numpy as jnp
import numpy as np

from gfnerf_tpu.engine.optimizers import (
    OptimizersConfig,
    build_optimizer,
    mask_frozen_grads,
    optimizer_arg,
)
from gfnerf_tpu.fields.field import STAGE_BLOCK, FieldConfig, init_field_params


def _setup(wd):
    fcfg = FieldConfig(num_images=4, n_volumes=4, num_levels=2,
                       features_per_level=2, log2_hashmap_size=6, n_blocks=2)
    params, _ = init_field_params(fcfg, seed=0)
    cfg = OptimizersConfig(steps_perssampler_init=10,
                           steps_per_split_dataset=5, n_split_dataset=2,
                           block_weight_decay=wd)
    tx = build_optimizer(cfg, params)
    return params, tx


def _one_block_update(params, tx):
    import jax

    params_nb, table = optimizer_arg(params)
    table = table + 0.5  # pretend the residual has trained to nonzero
    opt_state = tx.init((params_nb, table))
    zero_grads = (mask_frozen_grads(
        jax.tree_util.tree_map(jnp.zeros_like, params_nb), STAGE_BLOCK),
        jnp.zeros_like(table))
    updates, _ = tx.update(zero_grads, opt_state, (params_nb, table))
    return table, updates[1]


def test_weight_decay_pulls_residual_toward_zero():
    params, tx = _setup(wd=0.1)
    table, upd = _one_block_update(params, tx)
    # zero grad + decay: update must oppose the table's sign
    assert float(jnp.max(upd * jnp.sign(table))) < 0


def test_no_decay_means_zero_update_on_zero_grad():
    params, tx = _setup(wd=0.0)
    _, upd = _one_block_update(params, tx)
    np.testing.assert_allclose(np.asarray(upd), 0.0, atol=1e-12)
