"""Learning-rate schedules.

Ports of ``nerfstudio/engine/schedulers.py``: exponential decay with warmup
(:77-109) and the GF-NeRF variant (:138-185) that computes a *relative* step
restarting the decay for every focal split-dataset phase (:163-171).

Implemented as pure jnp functions of the global step so they are jittable
(used through ``optax.scale_by_schedule``).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass
class ExponentialDecaySchedulerConfig:
    lr_final: float | None = None
    warmup_steps: int = 0
    lr_pre_warmup: float = 1e-8
    max_steps: int = 100000
    ramp: str = "cosine"


@dataclasses.dataclass
class GFNerfExponentialDecaySchedulerConfig(ExponentialDecaySchedulerConfig):
    n_split_dataset: int = 1
    n_dataset_circles: int = 1
    steps_per_split_dataset: int = 1000
    steps_perssampler_init: int = 10000


def _decay(relative_step, cfg, lr_init: float, lr_final: float):
    t = jnp.clip(
        (relative_step - cfg.warmup_steps)
        / max(cfg.max_steps - cfg.warmup_steps, 1),
        0.0, 1.0,
    )
    return jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)


def _warmup(step, cfg, lr_init: float):
    if cfg.ramp == "cosine":
        return cfg.lr_pre_warmup + (1 - cfg.lr_pre_warmup) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / max(cfg.warmup_steps, 1), 0, 1)
        )
    return cfg.lr_pre_warmup + (lr_init - cfg.lr_pre_warmup) * step / max(
        cfg.warmup_steps, 1
    )


def exponential_decay_schedule(cfg: ExponentialDecaySchedulerConfig,
                               lr_init: float):
    """schedulers.py:77-109. Returns step -> lr."""
    lr_final = cfg.lr_final if cfg.lr_final is not None else lr_init

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        lr = jnp.where(
            step < cfg.warmup_steps,
            _warmup(step, cfg, lr_init),
            _decay(step, cfg, lr_init, lr_final),
        )
        return lr

    return schedule


def gfnerf_exponential_decay_schedule(
    cfg: GFNerfExponentialDecaySchedulerConfig, lr_init: float
):
    """schedulers.py:138-185: restart the decay for each split phase."""
    lr_final = cfg.lr_final if cfg.lr_final is not None else lr_init

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        init = cfg.steps_perssampler_init
        per_split = cfg.steps_per_split_dataset
        n_split = cfg.n_split_dataset
        in_init = (init > 0) & (step < init)
        split_idx = jnp.floor_divide(
            jnp.maximum(step - init, 0), per_split
        ) % n_split
        circles = jnp.floor_divide(
            jnp.maximum(step - init, 0), per_split * n_split
        )
        relative = (
            step - init
            - circles * per_split * n_split
            - split_idx * per_split
            + circles * per_split
        )
        relative = jnp.where(in_init, step, relative)
        lr = jnp.where(
            step < cfg.warmup_steps,
            _warmup(step, cfg, lr_init),
            _decay(relative, cfg, lr_init, lr_final),
        )
        return lr

    return schedule
