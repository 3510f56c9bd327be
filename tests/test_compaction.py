"""Per-ray compaction budget semantics (VERDICT r1 weak item 5 / fix 6c).

When the batch's total valid samples exceed R*budget, every ray must keep
its own first `budget` valid samples — a batch-global first-come fill would
silently strip ALL samples from rays late in the batch.
"""

import jax.numpy as jnp
import numpy as np

from gfnerf_tpu.cameras.rays import WarpedSamples
from gfnerf_tpu.fields.field import (
    STAGE_INIT,
    FieldConfig,
    init_field_params,
)
from gfnerf_tpu.models.gfnerf import GFNeRFModelConfig, model_forward


def _make_samples(r, s, valid):
    world = np.random.default_rng(0).uniform(-0.5, 0.5, (r, s, 3)).astype(
        np.float32)
    return WarpedSamples(
        world_pts=jnp.asarray(world),
        warp_pts=jnp.asarray(world),
        dists=jnp.full((r, s), 0.01),
        ts=jnp.cumsum(jnp.full((r, s), 0.01), axis=1),
        trans_idx=jnp.where(jnp.asarray(valid), 0, -1).astype(jnp.int32),
        oct_idx=jnp.zeros((r, s), jnp.int32),
        block_idx=jnp.zeros((r, s), jnp.int32),
        valid=jnp.asarray(valid),
        num_valid=jnp.sum(jnp.asarray(valid), axis=-1).astype(jnp.int32),
        first_oct_dis=jnp.zeros((r,)),
    )


def test_budget_cap_is_per_ray():
    r, s, budget = 8, 32, 8
    # every ray fully valid: total = 8*32 = 256 >> r*budget = 64
    valid = np.ones((r, s), bool)
    samples = _make_samples(r, s, valid)

    fcfg = FieldConfig(num_images=1, n_volumes=1, log2_hashmap_size=8,
                       n_blocks=0)
    params, statics = init_field_params(fcfg, seed=0)
    mcfg = GFNeRFModelConfig(n_blocks=0, scale_factor=1.0,
                             samples_budget_per_ray=budget)
    out = model_forward(params, statics, fcfg, mcfg, samples,
                        jnp.ones((r, 3)) / np.sqrt(3.0),
                        jnp.zeros((r,), jnp.int32), STAGE_INIT, 0)
    dens = np.asarray(out["weights"])  # (r, s): nonzero only where evaluated
    # EVERY ray keeps exactly its first `budget` samples — in particular the
    # LAST ray must not be starved by earlier rays filling the global buffer
    alphas = np.asarray(out["alphas"])
    for i in range(r):
        assert alphas[i, :budget].max() > 0, f"ray {i} lost all its samples"
        assert np.all(alphas[i, budget:] == 0), (
            f"ray {i} evaluated beyond its per-ray budget")


def test_budget_cap_respects_validity_prefix():
    """Rays with ragged validity keep their first `budget` VALID samples."""
    r, s, budget = 4, 16, 4
    valid = np.zeros((r, s), bool)
    valid[0, :2] = True          # fewer than budget
    valid[1, 4:12] = True        # more than budget, offset start
    valid[2, :] = True
    # ray 3: nothing valid
    samples = _make_samples(r, s, valid)
    fcfg = FieldConfig(num_images=1, n_volumes=1, log2_hashmap_size=8,
                       n_blocks=0)
    params, statics = init_field_params(fcfg, seed=0)
    mcfg = GFNeRFModelConfig(n_blocks=0, scale_factor=1.0,
                             samples_budget_per_ray=budget)
    out = model_forward(params, statics, fcfg, mcfg, samples,
                        jnp.ones((r, 3)) / np.sqrt(3.0),
                        jnp.zeros((r,), jnp.int32), STAGE_INIT, 0)
    alphas = np.asarray(out["alphas"])
    assert alphas[0, :2].max() > 0 and np.all(alphas[0, 2:] == 0)
    assert alphas[1, 4:8].max() > 0, "offset-valid ray lost its samples"
    assert np.all(alphas[1, 8:] == 0), "ray 1 exceeded its per-ray budget"
    assert alphas[2, :budget].max() > 0
    assert np.all(alphas[3] == 0)
