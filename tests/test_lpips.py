"""Sanity tests for the self-contained LPIPS-style perceptual metric."""

import numpy as np

from gfnerf_tpu.model_components.lpips import lpips


def test_identical_images_zero():
    rng = np.random.default_rng(0)
    img = rng.random((32, 48, 3)).astype(np.float32)
    assert float(lpips(img, img)) < 1e-6


def test_monotone_in_corruption():
    """Distance must grow with corruption strength (the self-consistency
    property the substitute metric is documented to provide)."""
    rng = np.random.default_rng(1)
    base = np.zeros((64, 64, 3), np.float32)
    base[16:48, 16:48] = 0.8  # structured content
    noise = rng.standard_normal(base.shape).astype(np.float32)
    prev = 0.0
    for scale in (0.05, 0.15, 0.4):
        noisy = np.clip(base + scale * noise, 0, 1)
        d = float(lpips(base, noisy))
        assert d > prev
        prev = d


def test_determinism_and_batch():
    rng = np.random.default_rng(2)
    a = rng.random((2, 16, 16, 3)).astype(np.float32)
    b = rng.random((2, 16, 16, 3)).astype(np.float32)
    d1 = float(lpips(a, b))
    d2 = float(lpips(a, b))
    assert d1 == d2
    assert np.isfinite(d1) and d1 > 0
