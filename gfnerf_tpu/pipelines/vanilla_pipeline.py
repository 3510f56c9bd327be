"""Vanilla pipeline for the stock (non-GF-NeRF) model families.

Equivalent of ``nerfstudio/pipelines/base_pipeline.py::VanillaPipeline``:
datamanager + model, single-stage training.  Drives the nerfacto /
vanilla-nerf models in ``gfnerf_tpu/models/nerfacto.py`` with a jitted
loss+grad+Adam step.
"""

from __future__ import annotations

import dataclasses
import json
import os
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gfnerf_tpu.cameras.cameras import generate_rays_multi, get_image_coords
from gfnerf_tpu.data.datamanager import GFNerfDataManagerConfig
from gfnerf_tpu.data.dataset import ImageCache, InputDataset
from gfnerf_tpu.data.pixel_samplers import PixelSampler
from gfnerf_tpu.models import nerfacto as nerfacto_mod
from gfnerf_tpu.utils import profiler


@dataclasses.dataclass
class VanillaPipelineConfig:
    model_kind: str = "nerfacto"       # "nerfacto" | "vanilla-nerf"
    train_num_rays_per_batch: int = 4096
    dynamic_batch: bool = False
    """DynamicBatchPipeline equivalent (reference pipelines/dynamic_batch.py:
    40-105): retarget rays/batch so total evaluated samples stays near
    target_num_samples.  TPU adaptation: the ray count is bucketed to powers
    of two so XLA compiles at most a handful of batch shapes instead of
    retracing every step."""
    target_num_samples: int = 1 << 18
    eval_num_rays_per_chunk: int = 4096
    lr_init: float = 1e-2
    lr_final: float = 1e-4
    max_steps: int = 30000
    seed: int = 42
    nerfacto: nerfacto_mod.NerfactoConfig = dataclasses.field(
        default_factory=nerfacto_mod.NerfactoConfig)
    vanilla: nerfacto_mod.VanillaNerfConfig = dataclasses.field(
        default_factory=nerfacto_mod.VanillaNerfConfig)
    mipnerf: nerfacto_mod.MipNerfConfig = dataclasses.field(
        default_factory=nerfacto_mod.MipNerfConfig)
    tensorf: "object" = dataclasses.field(
        default_factory=lambda: __import__(
            "gfnerf_tpu.models.tensorf", fromlist=["TensoRFConfig"]
        ).TensoRFConfig())
    neus: "object" = dataclasses.field(
        default_factory=lambda: __import__(
            "gfnerf_tpu.models.neus", fromlist=["NeuSConfig"]
        ).NeuSConfig())
    instant_ngp: "object" = dataclasses.field(
        default_factory=lambda: __import__(
            "gfnerf_tpu.models.instant_ngp", fromlist=["InstantNGPConfig"]
        ).InstantNGPConfig())
    nerfplayer: "object" = dataclasses.field(
        default_factory=lambda: __import__(
            "gfnerf_tpu.models.nerfplayer", fromlist=["NerfplayerConfig"]
        ).NerfplayerConfig())
    nerfplayer_ngp: "object" = dataclasses.field(
        default_factory=lambda: __import__(
            "gfnerf_tpu.models.nerfplayer", fromlist=["NerfplayerNGPConfig"]
        ).NerfplayerNGPConfig())
    semantic_nerfw: "object" = dataclasses.field(
        default_factory=lambda: __import__(
            "gfnerf_tpu.models.semantic_nerfw",
            fromlist=["SemanticNerfWConfig"]).SemanticNerfWConfig())

    def build(self, dataparser, base_dir, test_mode="train"):
        return VanillaPipeline(self, dataparser, base_dir, test_mode)


class VanillaPipeline:
    def __init__(self, config: VanillaPipelineConfig, dataparser,
                 base_dir: Path, test_mode: str = "train"):
        self.config = config
        self.base_dir = Path(base_dir)
        self.train_outputs = dataparser.get_dataparser_outputs("train")
        self.eval_outputs = dataparser.get_dataparser_outputs("val")
        self.model_state = None
        self.train_dataset = InputDataset(self.train_outputs)
        self.eval_dataset = InputDataset(self.eval_outputs)
        self.cache = ImageCache(self.train_dataset, seed=config.seed)
        self.pixel_sampler = PixelSampler(config.train_num_rays_per_batch,
                                          seed=config.seed)
        self.cameras_dev = self.train_outputs.cameras.to_device()
        self._rng = jax.random.PRNGKey(config.seed)

        kind = config.model_kind
        if kind == "nerfacto":
            mcfg = dataclasses.replace(
                config.nerfacto, num_images=len(self.train_outputs.cameras))
            params, statics = nerfacto_mod.init_nerfacto_params(
                mcfg, seed=config.seed)
            loss_fn = lambda p, ms, rng, o, d, rel, tgt: nerfacto_mod.nerfacto_loss(
                p, statics, mcfg, rng, o, d, rel, tgt)
            self._render = lambda p, ms, rng, o, d, rel: nerfacto_mod.nerfacto_forward(
                p, statics, mcfg, rng, o, d, rel, train=False)
            self.statics = statics
        elif kind == "instant-ngp":
            from gfnerf_tpu.models import instant_ngp as ngp

            mcfg = dataclasses.replace(
                config.instant_ngp, num_images=len(self.train_outputs.cameras))
            params, statics, self.model_state = ngp.init_instant_ngp_params(
                mcfg, seed=config.seed)
            loss_fn = lambda p, ms, rng, o, d, rel, tgt: ngp.instant_ngp_loss(
                p, statics, ms, mcfg, rng, o, d, tgt)
            self._render = lambda p, ms, rng, o, d, rel: ngp.instant_ngp_forward(
                p, statics, ms, mcfg, rng, o, d, train=False)
            self.statics = statics
            self._occ_update = jax.jit(
                lambda p, ms, rng: ngp.update_occupancy(p, statics, ms, mcfg,
                                                        rng))
        elif kind == "mipnerf":
            mcfg = config.mipnerf
            params = nerfacto_mod.init_mipnerf_params(mcfg, seed=config.seed)
            # cone radii derived from the rays' pixel footprint
            # (reference rays.py:49 frustum radii; ROADMAP r1 gap closed)
            loss_fn = lambda p, ms, rng, o, d, rel, tgt, pa=None: (
                nerfacto_mod.mipnerf_loss(p, mcfg, rng, o, d, tgt,
                                          pixel_area=pa))
            self._wants_pixel_area = True
            self._render = lambda p, ms, rng, o, d, rel: nerfacto_mod.mipnerf_forward(
                p, mcfg, rng, o, d, train=False)["fine"]
            self.statics = {}
        elif kind == "tensorf":
            from gfnerf_tpu.models import tensorf as trf

            mcfg = dataclasses.replace(
                config.tensorf, num_images=len(self.train_outputs.cameras))
            params = trf.init_tensorf_params(mcfg, seed=config.seed)
            loss_fn = lambda p, ms, rng, o, d, rel, tgt: trf.tensorf_loss(
                p, mcfg, rng, o, d, tgt)
            self._render = lambda p, ms, rng, o, d, rel: trf.tensorf_forward(
                p, mcfg, rng, o, d, train=False)
            self.statics = {}
        elif kind == "neus":
            from gfnerf_tpu.models import neus as neus_mod

            mcfg = dataclasses.replace(
                config.neus, num_images=len(self.train_outputs.cameras))
            params = neus_mod.init_neus_params(mcfg, seed=config.seed)
            loss_fn = lambda p, ms, rng, o, d, rel, tgt: neus_mod.neus_loss(
                p, mcfg, rng, o, d, tgt)
            self._render = lambda p, ms, rng, o, d, rel: neus_mod.neus_forward(
                p, mcfg, rng, o, d, train=False)
            self.statics = {}
        elif kind == "nerfplayer-nerfacto":
            from gfnerf_tpu.models import nerfplayer as npl

            mcfg = dataclasses.replace(
                config.nerfplayer,
                num_images=len(self.train_outputs.cameras))
            params, statics = npl.init_nerfplayer_params(
                mcfg, seed=config.seed,
                camera_times=self.train_outputs.metadata.get("times"))
            loss_fn = lambda p, ms, rng, o, d, rel, tgt: npl.nerfplayer_loss(
                p, statics, mcfg, rng, o, d, rel, tgt)
            self._render = lambda p, ms, rng, o, d, rel: npl.nerfplayer_forward(
                p, statics, mcfg, rng, o, d, rel, train=False)
            self.statics = statics
        elif kind == "nerfplayer-ngp":
            from gfnerf_tpu.models import nerfplayer as npl

            mcfg = dataclasses.replace(
                config.nerfplayer_ngp,
                num_images=len(self.train_outputs.cameras))
            params, statics, self.model_state = (
                npl.init_nerfplayer_ngp_params(
                    mcfg, seed=config.seed,
                    camera_times=self.train_outputs.metadata.get("times")))
            loss_fn = lambda p, ms, rng, o, d, rel, tgt: (
                npl.nerfplayer_ngp_loss(p, statics, ms, mcfg, rng, o, d,
                                        rel, tgt))
            self._render = lambda p, ms, rng, o, d, rel: (
                npl.nerfplayer_ngp_forward(p, statics, ms, mcfg, rng, o, d,
                                           rel, train=False))
            self.statics = statics
            self._occ_update = jax.jit(
                lambda p, ms, rng: npl.update_ngp_occupancy(p, statics, ms,
                                                            mcfg, rng))
        elif kind == "semantic-nerfw":
            from gfnerf_tpu.models import semantic_nerfw as snw

            mcfg = dataclasses.replace(
                config.semantic_nerfw,
                num_images=len(self.train_outputs.cameras))
            params, statics = snw.init_semantic_nerfw_params(
                mcfg, seed=config.seed)
            loss_fn = lambda p, ms, rng, o, d, rel, tgt, sem=None: (
                snw.semantic_nerfw_loss(p, statics, mcfg, rng, o, d, rel,
                                        tgt, semantics=sem))
            self._render = lambda p, ms, rng, o, d, rel: (
                snw.semantic_nerfw_forward(p, statics, mcfg, rng, o, d, rel,
                                           train=False))
            self.statics = statics
            self._wants_semantics = True
        elif kind == "vanilla-nerf":
            mcfg = config.vanilla
            params = nerfacto_mod.init_vanilla_params(mcfg, seed=config.seed)
            loss_fn = lambda p, ms, rng, o, d, rel, tgt: nerfacto_mod.vanilla_loss(
                p, mcfg, rng, o, d, tgt)
            self._render = lambda p, ms, rng, o, d, rel: nerfacto_mod.vanilla_forward(
                p, mcfg, rng, o, d, train=False)["fine"]
            self.statics = {}
        else:
            raise ValueError(kind)
        self.model_cfg = mcfg

        sched = optax.exponential_decay(
            config.lr_init, config.max_steps,
            config.lr_final / config.lr_init)
        self.tx = optax.adam(sched, eps=1e-15)
        self.params = params
        self.opt_state = self.tx.init(params)
        self.step_count = jnp.asarray(0, jnp.int32)

        wants_sem = getattr(self, "_wants_semantics", False)
        wants_pa = getattr(self, "_wants_pixel_area", False)

        @jax.jit
        def train_step(params, model_state, opt_state, rng, o, d, rel, tgt,
                       sem=None, pa=None):
            args = (params, model_state, rng, o, d, rel, tgt)
            if wants_sem:
                (total, (losses, out)), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(*args, sem)
            elif wants_pa:
                (total, (losses, out)), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(*args, pa)
            else:
                (total, (losses, out)), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(*args)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            mse = jnp.mean((out["rgb"] - tgt) ** 2) if isinstance(out, dict) \
                and "rgb" in out else jnp.mean(
                    (out["fine"]["rgb"] - tgt) ** 2)
            metrics = {"loss": total, **losses,
                       "psnr": -10.0 * jnp.log10(mse + 1e-12)}
            if isinstance(out, dict) and "keep_frac" in out:
                metrics["num_samples_per_batch"] = (
                    out["keep_frac"] * out["weights"].size)
            return params, opt_state, metrics

        self._train_step = train_step
        self._render_jit = jax.jit(self._render)

    @property
    def state(self):
        return {"params": self.params, "opt_state": self.opt_state}

    @profiler.time_function
    def get_train_loss_dict(self, step: int):
        self.cache.step()
        batch = self.pixel_sampler.sample(self.cache)
        rays = generate_rays_multi(
            self.cameras_dev, jnp.asarray(batch["camera_indices"]),
            jnp.asarray(batch["coords"]))
        self._rng, key = jax.random.split(self._rng)
        if self.model_state is not None and step % 16 == 0:
            self._rng, okey = jax.random.split(self._rng)
            self.model_state = self._occ_update(self.params,
                                                self.model_state, okey)
        sem = (jnp.asarray(batch["semantics"])
               if getattr(self, "_wants_semantics", False)
               and "semantics" in batch else None)
        pa = (rays.get("pixel_area")
              if getattr(self, "_wants_pixel_area", False) else None)
        self.params, self.opt_state, metrics = self._train_step(
            self.params, self.model_state, self.opt_state, key,
            rays["origins"], rays["directions"],
            jnp.asarray(batch["rel_camera_indices"]),
            jnp.asarray(batch["image"]), sem, pa)
        metrics = {k: float(v) for k, v in metrics.items()}
        if self.config.dynamic_batch and "num_samples_per_batch" in metrics:
            self._retarget_batch_size(metrics["num_samples_per_batch"])
            metrics["num_rays_per_batch"] = self.pixel_sampler.num_rays_per_batch
        return metrics

    def _retarget_batch_size(self, num_samples: float):
        """dynamic_batch.py:72-77 scaling, bucketed to powers of two within
        [256, configured batch] to bound XLA recompilations."""
        cur = self.pixel_sampler.num_rays_per_batch
        want = cur * self.config.target_num_samples / max(num_samples, 1.0)
        bucket = 1 << max(8, int(np.log2(max(want, 1.0))))
        bucket = min(bucket, self.config.train_num_rays_per_batch)
        if bucket != cur:
            self.pixel_sampler.set_num_rays_per_batch(bucket)

    def after_train_iteration(self, step: int):
        pass

    def render_camera(self, cameras_host, camera_idx: int, step: int = 0,
                      downscale: int = 1, **_):
        h = int(cameras_host.height[camera_idx]) // downscale
        w = int(cameras_host.width[camera_idx]) // downscale
        coords = get_image_coords(h, w) * downscale
        from gfnerf_tpu.cameras.cameras import generate_rays

        rays = generate_rays(cameras_host.to_device(), camera_idx,
                             jnp.asarray(coords))
        o = np.asarray(rays["origins"]).reshape(-1, 3)
        d = np.asarray(rays["directions"]).reshape(-1, 3)
        chunk = self.config.eval_num_rays_per_chunk
        outs = []
        for s in range(0, o.shape[0], chunk):
            e = min(s + chunk, o.shape[0])
            ro, rd = jnp.asarray(o[s:e]), jnp.asarray(d[s:e])
            if e - s < chunk:
                pad = chunk - (e - s)
                ro = jnp.concatenate([ro, jnp.tile(ro[-1:], (pad, 1))])
                rd = jnp.concatenate([rd, jnp.tile(rd[-1:], (pad, 1))])
            out = self._render_jit(self.params, self.model_state,
                                   jax.random.PRNGKey(0), ro, rd,
                                   jnp.zeros((chunk,), jnp.int32))
            outs.append({k: np.asarray(v)[: e - s] for k, v in out.items()
                         if k in ("rgb", "accumulation", "depth")})
        return {k: np.concatenate([oo[k] for oo in outs]).reshape(h, w, -1)
                for k in outs[0]}

    def get_eval_image_metrics_and_images(self, step: int, idx: int = 0):
        import time as _time

        from gfnerf_tpu.pipelines.pipeline import compute_ssim

        idx = idx % len(self.eval_dataset)
        gt = self.eval_dataset.get_image(idx)
        t0 = _time.perf_counter()
        out = self.render_camera(self.eval_outputs.cameras, idx, step)
        dt = _time.perf_counter() - t0
        pred = out["rgb"]
        mse = float(np.mean((pred - gt) ** 2))
        metrics = {"psnr": -10.0 * np.log10(mse + 1e-12),
                   "ssim": compute_ssim(pred, gt),
                   "num_rays_per_sec": gt.shape[0] * gt.shape[1] / dt,
                   "fps": 1.0 / dt}
        images = {"img": np.concatenate([gt, pred], axis=1),
                  "depth": out["depth"]}
        return metrics, images

    def get_average_eval_image_metrics(self, step: int):
        n = len(self.eval_dataset)
        ms = [self.get_eval_image_metrics_and_images(step, i)[0]
              for i in range(n)]
        return {k: float(np.mean([m[k] for m in ms])) for k in ms[0]}

    # ------------------------------------------------------- checkpointing ----

    def save_checkpoint_state(self, ckpt_dir: Path, step: int):
        import orbax.checkpoint as ocp

        ocp.PyTreeCheckpointer().save(
            (Path(ckpt_dir) / "state").absolute(),
            {"params": self.params, "opt_state": self.opt_state,
             "statics": self.statics})
        (Path(ckpt_dir) / "meta.json").write_text(
            json.dumps({"step": step, "sample_tmp_dir": ""}))

    def load_checkpoint_state(self, ckpt_dir: Path) -> int:
        import orbax.checkpoint as ocp

        target = {"params": self.params, "opt_state": self.opt_state,
                  "statics": self.statics}
        restored = ocp.PyTreeCheckpointer().restore(
            (Path(ckpt_dir) / "state").absolute(), item=target)
        self.params = restored["params"]
        self.opt_state = restored["opt_state"]
        self.statics = restored["statics"]
        meta = json.loads((Path(ckpt_dir) / "meta.json").read_text())
        return int(meta["step"])
