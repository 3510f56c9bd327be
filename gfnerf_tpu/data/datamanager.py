"""GF-NeRF data manager.

Port of ``GFNerfDataManager`` (``nerfstudio/data/datamanagers/
base_datamanager.py:541-993``):

- full train dataset + downsampled "init" dataset (<=100k linspaced cameras,
  :660-686) + n contiguous per-split datasets (:687-715),
- ``setup_train_split_oct`` (:783-861): on split change, select cameras by
  cluster label, attach error maps from the sample_tmp npy dir, rebuild the
  image cache and pick the error-guided pixel sampler,
- ``next_train`` (:923-948): routes init vs split caches, emits the ray
  batch (+ the sampled ray indices so the pipeline can write live errors
  back, gf_pipeline.py:179-186).

Host side: numpy image caches + samplers. The returned batch is a dict of
fixed-shape numpy arrays ready to ship to the device step.
"""

from __future__ import annotations

import dataclasses
import os
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from gfnerf_tpu.data.dataparsers.base import DataparserOutputs
from gfnerf_tpu.data.dataset import ImageCache, InputDataset
from gfnerf_tpu.data.pixel_samplers import (
    ErrorPixelSampler,
    PixelSampler,
    SemanticPixelSampler,
    collate_batch,
)


@dataclasses.dataclass
class GFNerfDataManagerConfig:
    n_split_dataset: int = 10
    steps_per_split_dataset: int = 10000
    steps_perssampler_init: int = 30000
    train_num_rays_per_batch: int = 8192
    eval_num_rays_per_batch: int = 2048
    train_num_images_to_sample_from: int = 500
    train_num_times_to_repeat_images: int = 1000
    patch_size: int = 1
    camera_res_scale_factor: float = 1.0
    max_init_images: int = 100000   # base_datamanager.py:662
    semantic_sample_weights: Optional[List[float]] = None
    focal_uniform_fraction: float = 0.0
    """Fraction of each FOCAL batch drawn uniformly from the FULL (init)
    dataset instead of the active cluster's error-weighted pixels.
    QUALITY.md finding 7 fix (c): the focal stage's cluster-only supervision
    leaves residual rows that are hash-shared between surface cells and
    empty-space cells along other rays without corrective gradient (the
    fog-overfit mechanism); mixing full-scene rays restores the init stage's
    self-regularization while keeping most capacity on the active cluster.
    The mixed rays sit at the END of the batch (``n_split_rays`` marks the
    boundary) and are excluded from the error-map writeback."""


class GFNerfDataManager:
    def __init__(self, config: GFNerfDataManagerConfig, dataparser,
                 seed: int = 0):
        self.config = config
        self.dataparser = dataparser
        self.seed = seed
        self.split_idx = -1

        self.train_dataparser_outputs: DataparserOutputs = (
            dataparser.get_dataparser_outputs(split="train")
        )
        self.eval_dataparser_outputs: DataparserOutputs = (
            dataparser.get_dataparser_outputs(split="val")
        )
        self.train_dataset = InputDataset(
            self.train_dataparser_outputs, config.camera_res_scale_factor
        )
        self.eval_dataset = InputDataset(
            self.eval_dataparser_outputs, config.camera_res_scale_factor
        )

        # init dataset: linspaced subset (base_datamanager.py:660-686)
        n_cameras = len(self.train_dataparser_outputs.cameras)
        k = min(n_cameras, config.max_init_images)
        init_indices = np.linspace(0, n_cameras - 1, k, dtype=np.int32)
        self.init_outputs = self.train_dataparser_outputs.select(init_indices)
        self.train_dataset_init = InputDataset(
            self.init_outputs, config.camera_res_scale_factor
        )

        self.setup_train()
        self.setup_eval()

    # ------------------------------------------------------------- setup ----

    def setup_train(self):
        cfg = self.config
        self.init_cache = ImageCache(
            self.train_dataset_init,
            num_images_to_sample_from=cfg.train_num_images_to_sample_from,
            num_times_to_repeat=cfg.train_num_times_to_repeat_images,
            seed=self.seed,
        )
        self.init_pixel_sampler = PixelSampler(
            cfg.train_num_rays_per_batch, cfg.patch_size, seed=self.seed
        )
        self.split_cache: Optional[ImageCache] = None
        self.split_pixel_sampler: Optional[PixelSampler] = None
        self.split_outputs: Optional[DataparserOutputs] = None

    def setup_eval(self):
        self.eval_cache = ImageCache(self.eval_dataset, seed=self.seed + 1)
        self.eval_pixel_sampler = PixelSampler(
            self.config.eval_num_rays_per_batch, seed=self.seed + 1
        )

    def _build_split(self, camera_labels: np.ndarray, cur_split_idx: int,
                     sample_tmp_dir: Optional[str],
                     num_rays_per_batch: Optional[int] = None):
        """(outputs, sel, cache, sampler) for one cluster's focal split."""
        cfg = self.config
        error_map_filenames = None
        if sample_tmp_dir is not None and os.path.isdir(sample_tmp_dir):
            npy_dir = Path(sample_tmp_dir) / "npy"
            error_map_filenames = [
                npy_dir / (os.path.basename(str(f)) + ".npy")
                for f in self.train_dataparser_outputs.image_filenames
            ]

        sel = np.where(np.asarray(camera_labels).reshape(-1) == cur_split_idx)[0]
        outputs = self.train_dataparser_outputs.select(sel)
        if error_map_filenames is not None:
            outputs.metadata["error_map_filenames"] = [
                error_map_filenames[i] for i in sel
            ]
        dataset = InputDataset(outputs, cfg.camera_res_scale_factor)
        cache = ImageCache(
            dataset,
            num_images_to_sample_from=cfg.train_num_images_to_sample_from,
            num_times_to_repeat=cfg.train_num_times_to_repeat_images,
            seed=self.seed + cur_split_idx,
        )
        n_rays = num_rays_per_batch or cfg.train_num_rays_per_batch
        if error_map_filenames is not None:
            sampler = ErrorPixelSampler(n_rays, seed=self.seed)
        elif cfg.semantic_sample_weights is not None:
            sampler = SemanticPixelSampler(
                n_rays, class_weights=cfg.semantic_sample_weights,
                seed=self.seed)
        else:
            sampler = PixelSampler(n_rays, cfg.patch_size, seed=self.seed)
        return outputs, sel, cache, sampler

    def setup_train_split_oct(self, camera_labels: Optional[np.ndarray],
                              cur_split_idx: int,
                              sample_tmp_dir: Optional[str]):
        """Switch the active focal split (base_datamanager.py:783-861)."""
        if self.split_idx == cur_split_idx:
            return
        assert camera_labels is not None
        self.split_idx = cur_split_idx
        (self.split_outputs, self._split_indices, self.split_cache,
         self.split_pixel_sampler) = self._build_split(
            camera_labels, cur_split_idx, sample_tmp_dir)

    # -------------------------------------------- parallel focal splits ----

    def setup_train_splits_parallel(self, camera_labels: np.ndarray,
                                    split_indices: List[int],
                                    sample_tmp_dir: Optional[str],
                                    num_rays_per_group: int):
        """Activate several clusters' splits at once (one per block-axis
        group of the parallel focal step, parallel/sharding.py)."""
        current = getattr(self, "_parallel_splits", {})
        new: Dict[int, tuple] = {}
        for s in split_indices:
            if s in current:
                new[s] = current[s]
            else:
                new[s] = self._build_split(camera_labels, s, sample_tmp_dir,
                                           num_rays_per_group)
        self._parallel_splits = new

    def next_train_parallel(self, step: int,
                            split_indices: List[int]) -> List[Dict]:
        """One batch per active split, in split_indices order.

        ``focal_uniform_fraction`` applies per group: each group's batch
        gets its tail replaced by full-scene uniform rays (same finding-7
        fix (c) as :meth:`next_train`), with ``n_split_rays`` marking the
        boundary for the per-group error writeback."""
        cfg = self.config
        batches = []
        for s in split_indices:
            outputs, sel, cache, sampler = self._parallel_splits[s]
            cache.step()
            batch = sampler.sample(cache)
            n_rays = batch["image"].shape[0]
            n_split = n_rays
            if cfg.focal_uniform_fraction > 0:
                n_mix = min(max(int(round(
                    cfg.focal_uniform_fraction * n_rays)), 0), n_rays - 1)
                if n_mix > 0:
                    n_split = n_rays - n_mix
                    self.init_cache.step()
                    mix_idx = self.init_pixel_sampler.sample_indices_uniform(
                        self.init_cache, n_mix)
                    mix = collate_batch(self.init_cache, mix_idx)
                    batch = {
                        k: np.concatenate([batch[k][:n_split], mix[k]],
                                          axis=0)
                        for k in ("indices", "image", "camera_indices",
                                  "rel_camera_indices", "coords",
                                  "semantics")
                        if k in batch and k in mix
                    }
            batch["n_split_rays"] = np.int32(n_split)
            batch["step"] = np.int32(step)
            batch["split_idx"] = np.int32(s)
            batch["_cache"] = cache
            batch["_outputs"] = outputs
            batches.append(batch)
        return batches

    # ------------------------------------------------------------ batches ----

    def next_train(self, step: int) -> Dict[str, np.ndarray]:
        """Fixed-shape host ray batch (base_datamanager.py:923-948)."""
        cfg = self.config
        init_stage = (cfg.steps_perssampler_init > 0
                      and step < cfg.steps_perssampler_init)
        if init_stage or self.split_cache is None:
            cache, sampler = self.init_cache, self.init_pixel_sampler
            outputs = self.init_outputs
        else:
            cache, sampler = self.split_cache, self.split_pixel_sampler
            outputs = self.split_outputs
        cache.step()
        batch = sampler.sample(cache)
        n_split = batch["image"].shape[0]
        if (not init_stage and self.split_cache is not None
                and cfg.focal_uniform_fraction > 0):
            # finding-7 fix (c): append full-scene uniform rays so residual
            # rows colliding with empty-space cells elsewhere keep receiving
            # corrective gradient (the init stage's self-regularization).
            n_mix = int(round(cfg.focal_uniform_fraction
                              * cfg.train_num_rays_per_batch))
            n_mix = min(max(n_mix, 0), cfg.train_num_rays_per_batch - 1)
            if n_mix > 0:
                n_split = cfg.train_num_rays_per_batch - n_mix
                self.init_cache.step()
                mix_idx = self.init_pixel_sampler.sample_indices_uniform(
                    self.init_cache, n_mix)
                mix = collate_batch(self.init_cache, mix_idx)
                batch = {
                    k: np.concatenate([batch[k][:n_split], mix[k]], axis=0)
                    for k in ("indices", "image", "camera_indices",
                              "rel_camera_indices", "coords", "semantics")
                    if k in batch and k in mix
                }
        batch["n_split_rays"] = np.int32(n_split)
        batch["step"] = np.int32(step)
        batch["split_idx"] = np.int32(-1 if init_stage else self.split_idx)
        batch["_cache"] = cache          # for error-map writeback
        batch["_outputs"] = outputs      # cameras of the active dataset
        return batch

    def next_eval(self, step: int) -> Dict[str, np.ndarray]:
        batch = self.eval_pixel_sampler.sample(self.eval_cache)
        batch["step"] = np.int32(step)
        batch["_outputs"] = self.eval_dataparser_outputs
        return batch

    def next_eval_image(self, idx: int):
        """(camera index, full image) for image-metric eval."""
        idx = idx % len(self.eval_dataset)
        return idx, self.eval_dataset.get_data(idx)
