"""Two-phase early-termination eval renderer.

The single-pass eval path (``make_render_fn``) evaluates the field on every
marched sample of every ray — but in a converged scene most rays saturate
(transmittance ~ 0) long before the sample budget: the tail samples of an
opaque ray contribute nothing.  The reference's CUDA renderer exits its
per-ray march loop when transmittance falls below a threshold
(a per-thread ``break``); on TPU, data-dependent per-ray loop exits don't
exist under XLA's static shapes, so the equivalent is *phased compaction
across dispatches*:

  phase 1  march the full sample lattice once, evaluate the field on the
           FIRST ``s1`` samples of every ray, composite -> per-ray partial
           (rgb, acc, depth) and transmittance T = 1 - acc;
  host     rays with T > eps survive; their indices are compacted and
           padded to a power-of-two BUCKET (a handful of static shapes,
           so phase 2 compiles at most ``log2(R/min_bucket)+1`` times);
  phase 2  gather the survivors' remaining samples [s1:], evaluate, and
           return their tail (rgb, acc, depth);
  host     exact composition: out = out1 + T[surv] * out2[surv].

Compositing is transmittance-linear (rgb and acc are ``sum_i w_i x_i``
with ``w_i = T_in * alpha_i * prod_{j<i}(1 - alpha_j)``; depth is the
normalized ``sum(w t) / (acc + 1e-10)`` — composed in weighted-SUM space
by un-normalizing each phase, see ops/pallas/composite.py), and invalid
sample slots carry dists == 0 (alpha == 0), so splitting the sample axis
at ``s1`` and scaling the tail by the head's outgoing transmittance
reproduces the single-pass result EXACTLY for surviving rays; terminated
rays drop a tail whose total weight is at most eps.

Not supported with the proposal path (num_proposal_resamples > 0): the
proposal resample redistributes fine samples over the WHOLE ray, so the
head/tail split does not commute with it.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gfnerf_tpu.models.gfnerf import (
    STAGE_BLOCK,
    STAGE_INIT,
    GFNeRFModelConfig,
    model_forward,
    sample_rays,
)


def _slice_samples(samples, start: int, stop: int):
    """Slice a WarpedSamples pytree along the samples axis (static bounds)."""
    def sl(name, val):
        if val is None:
            return None
        if name in ("num_valid", "first_oct_dis", "num_hits"):
            return val
        return val[:, start:stop]

    kw = {f.name: sl(f.name, getattr(samples, f.name))
          for f in dataclasses.fields(samples)}
    kw["num_valid"] = kw["valid"].sum(axis=1).astype(jnp.int32)
    return type(samples)(**kw)


def _gather_samples(samples, idx):
    """Gather rays ``idx`` from a WarpedSamples pytree."""
    kw = {f.name: (getattr(samples, f.name)[idx]
                   if getattr(samples, f.name) is not None else None)
          for f in dataclasses.fields(samples)}
    return type(samples)(**kw)


def _seg_cfg(model_cfg: GFNeRFModelConfig, seg: int, total: int):
    """Scale the compaction budget to the segment's share of the lattice.

    The budget is a per-ray cap on field-evaluated samples; keeping the
    full-ray budget on a partial segment would turn compaction off
    (budget >= segment length -> dense path) and waste field work on
    invalid slots."""
    budget = model_cfg.samples_budget_per_ray
    if budget > 0:
        budget = min(max(32, -(-budget * seg // total)), seg)
    # remat is a train-memory lever (no backward at eval) and its
    # divisibility constraint would not survive the phase-2 bucket shapes
    return dataclasses.replace(model_cfg, samples_budget_per_ray=budget,
                               remat_chunks=0)


def make_early_term_render_fns(field_cfg, model_cfg: GFNeRFModelConfig,
                               sampler_cfg, s1: int):
    """Build (phase1, phase2) jitted fns for the two-phase renderer.

    phase1(params, statics, oct_dev, rays_o, rays_d, rel, active_block,
           stage_is_block static) ->
        (out1 dict, samples, rel_b)   # samples stay on device for phase 2
    phase2(params, statics, oct_dev, samples, rays_d, rel_b, active_block,
           idx, stage_is_block static) -> out2 dict for rays ``idx``
    """
    S = sampler_cfg.max_samples
    assert 0 < s1 < S, (s1, S)
    assert model_cfg.num_proposal_resamples == 0, (
        "early-termination rendering does not compose with proposal "
        "resampling; render with make_render_fn for prop configs")
    assert model_cfg.background_color == "black", (
        "phase outputs must not each add a background term; composite "
        "with black background and add the background on the host")
    deferred = sampler_cfg.march == "fast"
    cfg1 = _seg_cfg(model_cfg, s1, S)
    cfg2 = _seg_cfg(model_cfg, S - s1, S)

    def _forward(cfg, params, statics, oct_dev, seg, rays_d, rel,
                 active_block, stage_is_block):
        if stage_is_block and field_cfg.n_blocks > 0:
            ab = jnp.asarray(active_block, jnp.int32)
            routed = (ab if ab.ndim == 1
                      and field_cfg.hash_layout == "packed"
                      and not field_cfg.use_proposal else None)
            return model_forward(params, statics, field_cfg, cfg, seg,
                                 rays_d, rel, STAGE_BLOCK,
                                 0 if routed is not None else ab,
                                 oct_dev=oct_dev, warp_deferred=deferred,
                                 routed_blocks=routed)
        return model_forward(params, statics, field_cfg, cfg, seg, rays_d,
                             rel, STAGE_INIT, 0, oct_dev=oct_dev,
                             warp_deferred=deferred)

    @functools.partial(jax.jit, static_argnums=(7,))
    def phase1(params, statics, oct_dev, rays_o, rays_d, rel_camera_index,
               active_block, stage_is_block):
        r = rays_o.shape[0]
        noise = jnp.ones((r, S))
        samples = sample_rays(oct_dev, rays_o, rays_d, noise,
                              jnp.asarray(1.0), sampler_cfg)
        rel = jnp.broadcast_to(jnp.asarray(rel_camera_index, jnp.int32),
                               (r,))
        seg = _slice_samples(samples, 0, s1)
        out = _forward(cfg1, params, statics, oct_dev, seg, rays_d, rel,
                       active_block, stage_is_block)
        out1 = {k: out[k] for k in
                ("rgb", "accumulation", "depth", "oct_depth")}
        return out1, samples, rel

    @functools.partial(jax.jit, static_argnums=(8,))
    def phase2(params, statics, oct_dev, samples, rays_d, rel_b,
               active_block, idx, stage_is_block):
        sub = _gather_samples(samples, idx)
        seg = _slice_samples(sub, s1, S)
        ab = jnp.asarray(active_block, jnp.int32)
        ab_g = ab[idx] if ab.ndim == 1 else ab
        out = _forward(cfg2, params, statics, oct_dev, seg, rays_d[idx],
                       rel_b[idx], ab_g, stage_is_block)
        return {k: out[k] for k in ("rgb", "accumulation", "depth")}

    return phase1, phase2


class EarlyTermRenderer:
    """Host orchestrator: render ray chunks with early termination.

    eps: transmittance below which a ray is considered terminated after
    phase 1 (the dropped tail's total weight is < eps).
    min_bucket: smallest phase-2 survivor shape; survivor counts round up
    to the next power of two >= this, bounding phase-2 recompiles to
    log2(R / min_bucket) + 1 distinct shapes.
    """

    def __init__(self, field_cfg, model_cfg, sampler_cfg, s1: Optional[int]
                 = None, eps: float = 5e-3, min_bucket: int = 512):
        S = sampler_cfg.max_samples
        self.s1 = s1 if s1 is not None else max(32, S // 4)
        self.eps = eps
        self.min_bucket = min_bucket
        self.phase1, self.phase2 = make_early_term_render_fns(
            field_cfg, model_cfg, sampler_cfg, self.s1)
        self.last_survivor_frac = None

    def render_chunk(self, params, statics, oct_dev, rays_o, rays_d,
                     rel_camera_index, active_block, stage_is_block: bool):
        r = rays_o.shape[0]
        out1, samples, rel_b = self.phase1(
            params, statics, oct_dev, rays_o, rays_d, rel_camera_index,
            jnp.asarray(active_block, jnp.int32), bool(stage_is_block))
        trans = 1.0 - np.asarray(out1["accumulation"]).reshape(r)
        surv = np.nonzero(trans > self.eps)[0]
        self.last_survivor_frac = len(surv) / r
        out = {k: np.array(v) for k, v in out1.items()}  # writable
        if len(surv) == 0:
            return out
        bucket = max(self.min_bucket, 1 << (len(surv) - 1).bit_length())
        bucket = min(bucket, r)
        pad = np.zeros(bucket - len(surv), dtype=surv.dtype)
        idx = jnp.asarray(np.concatenate([surv, pad]), jnp.int32)
        out2 = self.phase2(params, statics, oct_dev, samples, rays_d,
                           rel_b, jnp.asarray(active_block, jnp.int32),
                           idx, bool(stage_is_block))
        return self._compose(out, surv, trans, out2)

    def render_chunks(self, params, statics, oct_dev, chunks,
                      rel_camera_index, active_block, stage_is_block: bool):
        """Pipelined multi-chunk render: dispatch every chunk's phase 1
        before the first survivor readback, so phase-1 device work overlaps
        the host's survivor bookkeeping (JAX dispatch is async; a
        chunk-at-a-time loop would serialize device and host).

        ``chunks``: list of (rays_o, rays_d) device arrays.
        Returns a list of per-chunk output dicts (host numpy).
        """
        ab = jnp.asarray(active_block, jnp.int32)
        sb = bool(stage_is_block)
        p1 = [self.phase1(params, statics, oct_dev, o, d, rel_camera_index,
                          ab, sb) for o, d in chunks]
        outs, pending = [], []
        survivors = 0
        for (out1, samples, rel_b), (o, d) in zip(p1, chunks):
            r = o.shape[0]
            trans = 1.0 - np.asarray(out1["accumulation"]).reshape(r)
            surv = np.nonzero(trans > self.eps)[0]
            survivors += len(surv)
            out = {k: np.array(v) for k, v in out1.items()}  # writable
            if len(surv) == 0:
                pending.append((out, None, None, None))
                continue
            bucket = min(max(self.min_bucket,
                             1 << (len(surv) - 1).bit_length()), r)
            idx = jnp.asarray(np.concatenate(
                [surv, np.zeros(bucket - len(surv), surv.dtype)]), jnp.int32)
            out2 = self.phase2(params, statics, oct_dev, samples, d, rel_b,
                               ab, idx, sb)
            pending.append((out, surv, trans, out2))
        self.last_survivor_frac = survivors / sum(
            o.shape[0] for o, _ in chunks)
        for out, surv, trans, out2 in pending:
            if surv is not None:
                self._compose(out, surv, trans, out2)
            outs.append(out)
        return outs

    @staticmethod
    def _compose(out, surv, trans, out2):
        n = len(surv)
        t = trans[surv][:, None]                      # (n, 1)
        acc1 = out["accumulation"][surv]              # (n, 1)
        acc2 = np.asarray(out2["accumulation"])[:n]
        # depth is sum(w t) / (acc + 1e-10): un-normalize each phase, sum
        # in weighted-sum space, re-normalize with the total accumulation
        dsum1 = out["depth"][surv] * (acc1 + 1e-10)
        dsum2 = np.asarray(out2["depth"])[:n] * (acc2 + 1e-10)
        acc_tot = acc1 + t * acc2
        out["rgb"][surv] += t * np.asarray(out2["rgb"])[:n]
        out["accumulation"][surv] = acc_tot
        out["depth"][surv] = (dsum1 + t * dsum2) / (acc_tot + 1e-10)
        return out
