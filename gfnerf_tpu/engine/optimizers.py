"""Per-group optimizers over the field parameter pytree.

TPU-native equivalent of ``nerfstudio/engine/optimizers.py`` + the GF-NeRF
dynamic optimizer swapping (``gfnerf/nerfacto.py:448-489``):

- the reference keeps an optimizer dict keyed by param-group name and
  deletes/adds per-block optimizers at stage boundaries; here the structure
  is a single static ``optax.multi_transform`` over group labels
  ("fields" = MLPs + appearance + semantics, "base_encoding_init" = global
  hash table, "block" = the stacked residual tables), and stage "freezing"
  is done by zeroing frozen groups' gradients before the update — the
  pytree/opt-state shape never changes, which is what keeps the train step
  a single compiled XLA program and makes multi-chip sharding static,
- lr config mirrors gfnerf/config.py:132-141 (Adam eps 1e-15, fields/global
  1e-2 -> 1e-4 with the GF-NeRF restart scheduler) and the 5e-3 block-table
  lr from the ``update_optimizer`` callback (nerfacto.py:481),
- NaN-guard: nonfinite grads skip the step (trainer.py:416-426) via
  ``optax.apply_if_finite``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from gfnerf_tpu.engine.schedulers import (
    GFNerfExponentialDecaySchedulerConfig,
    gfnerf_exponential_decay_schedule,
)
from gfnerf_tpu.fields.field import FieldParams


@dataclasses.dataclass
class OptimizersConfig:
    fields_lr_init: float = 1e-2
    fields_lr_final: float = 1e-4
    block_lr_init: float = 5e-3          # nerfacto.py:481
    block_weight_decay: float = 0.0
    """AdamW-style decay on the focal residual tables (trust region).

    The residual tables hash the whole warped space; focal training visits
    only the active block's rays, so colliding rows elsewhere accumulate
    unconstrained noise that degrades every other view (QUALITY.md finding
    4). Decay pulls unsupported entries back toward the zero residual. The
    released reference never exercises its residual path at all
    (nerfacto_field.py:449 dead-code override) so no reference value
    exists; this is a TPU-repo stabilization."""
    adam_eps: float = 1e-15
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    camera_opt_lr: float = 6e-4          # config.py:84
    max_norm: Optional[float] = None
    steps_perssampler_init: int = 30000
    steps_per_split_dataset: int = 10000
    n_split_dataset: int = 10
    n_dataset_circles: int = 1


def field_param_labels(params: FieldParams) -> FieldParams:
    """Group label for every leaf of FieldParams."""
    def lab(name):
        return lambda leaf: name

    return FieldParams(
        global_feat="base_encoding_init",
        block_feats=None if params.block_feats is None else "block",
        base_net=jax.tree_util.tree_map(lab("fields"), params.base_net),
        mlp_head=jax.tree_util.tree_map(lab("fields"), params.mlp_head),
        appearance_embedding="fields",
        mlp_semantics=(None if params.mlp_semantics is None else
                       jax.tree_util.tree_map(lab("fields"),
                                              params.mlp_semantics)),
        semantics_head=(None if params.semantics_head is None else
                        jax.tree_util.tree_map(lab("fields"),
                                               params.semantics_head)),
        camera_adjustment=(None if params.camera_adjustment is None
                           else "camera_opt"),
        prop_feat=None if params.prop_feat is None else "fields",
        prop_net=(None if params.prop_net is None else
                  jax.tree_util.tree_map(lab("fields"), params.prop_net)),
    )


def build_optimizer(cfg: OptimizersConfig, params: FieldParams):
    """Returns an optax GradientTransformation over the field params."""
    sched_cfg = GFNerfExponentialDecaySchedulerConfig(
        lr_final=cfg.fields_lr_final,
        max_steps=cfg.steps_perssampler_init,
        n_split_dataset=cfg.n_split_dataset,
        n_dataset_circles=cfg.n_dataset_circles,
        steps_per_split_dataset=cfg.steps_per_split_dataset,
        steps_perssampler_init=cfg.steps_perssampler_init,
    )

    def group(lr_init, weight_decay=0.0):
        sched = gfnerf_exponential_decay_schedule(sched_cfg, lr_init)
        parts = []
        if cfg.max_norm is not None:
            parts.append(optax.clip_by_global_norm(cfg.max_norm))
        parts += [
            optax.scale_by_adam(b1=cfg.adam_b1, b2=cfg.adam_b2,
                                eps=cfg.adam_eps),
            # after Adam scaling => AdamW-style decoupled decay; always in
            # the chain (0.0 = no-op) so the opt-state STRUCTURE does not
            # depend on the hyperparameter and checkpoints restore across
            # sweep configs
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_schedule(sched),
            optax.scale(-1.0),
        ]
        return optax.chain(*parts)

    # The optimizer runs over (params_without_block_tables, active_table):
    # only the ACTIVE focal table carries Adam moments (the reference keeps
    # exactly one block optimizer alive at a time, nerfacto.py:448-489) —
    # holding moments for all stacked tables would double the largest
    # parameter group for no reason.
    params_nb = params.replace(block_feats=None)
    labels = (field_param_labels(params_nb),
              "block" if params.block_feats is not None else "fields")
    tx = optax.multi_transform(
        {
            "fields": group(cfg.fields_lr_init),
            "base_encoding_init": group(cfg.fields_lr_init),
            "block": group(cfg.block_lr_init,
                           weight_decay=cfg.block_weight_decay),
            "camera_opt": group(cfg.camera_opt_lr),
        },
        labels,
    )
    return optax.apply_if_finite(tx, max_consecutive_errors=10 ** 8)


def optimizer_arg(params: FieldParams):
    """The (params_without_blocks, active_table) pair the optimizer runs on.
    Uses block 0 as the placeholder slice for state init."""
    import jax.numpy as jnp

    params_nb = params.replace(block_feats=None)
    table = (params.block_feats[0] if params.block_feats is not None
             else jnp.zeros((1, 1, 2)))
    return (params_nb, table)


def mask_frozen_grads(grads: FieldParams, stage: int) -> FieldParams:
    """Zero the gradients of stage-frozen groups.

    init stage: block tables untouched (they're not in the forward graph, so
    their grads are structurally zero already). block stage: freeze fields +
    global table (nerfacto_field.py:459-461, 527-529, 548-551) — only the
    active residual table trains.
    """
    from gfnerf_tpu.fields.field import STAGE_BLOCK

    if stage != STAGE_BLOCK:
        return grads

    def zeros(tree):
        return jax.tree_util.tree_map(jnp.zeros_like, tree)

    return grads.replace(
        camera_adjustment=(None if grads.camera_adjustment is None else
                           jnp.zeros_like(grads.camera_adjustment)),
        global_feat=jnp.zeros_like(grads.global_feat),
        base_net=zeros(grads.base_net),
        mlp_head=zeros(grads.mlp_head),
        appearance_embedding=jnp.zeros_like(grads.appearance_embedding),
        mlp_semantics=(None if grads.mlp_semantics is None
                       else zeros(grads.mlp_semantics)),
        semantics_head=(None if grads.semantics_head is None
                        else zeros(grads.semantics_head)),
        prop_feat=(None if grads.prop_feat is None
                   else jnp.zeros_like(grads.prop_feat)),
        prop_net=(None if grads.prop_net is None
                  else zeros(grads.prop_net)),
    )
