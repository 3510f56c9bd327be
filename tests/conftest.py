"""Test configuration: force an 8-device virtual CPU mesh.

Must set env vars before jax is imported anywhere (SURVEY.md §4: multi-chip
tests run on a faked CPU mesh via xla_force_host_platform_device_count).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin's sitecustomize forces jax_platforms="axon,cpu" at
# interpreter start; re-force cpu before any backend initializes so tests
# run on the 8-device virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the smoke tests are dominated by XLA CPU
# compiles of the train/eval steps (~minutes); caching them makes repeat
# suite runs fast while first runs are unchanged.
_cache_dir = os.environ.get("GFNERF_TEST_CACHE",
                            "/tmp/gfnerf_tpu_xla_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


# Heavy end-to-end files (full trainer loops, parallel mesh steps): marked
# slow so the default inner loop is `pytest -m "not slow"`; CI / the driver
# still run everything (VERDICT r2 weak 7).
_SLOW_FILES = {
    "test_train_smoke.py",
    "test_parallel.py",
    "test_ten_blocks.py",
    "test_temporal.py",
    "test_components.py",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.fspath.basename in _SLOW_FILES:
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_ring_cameras(n: int = 20, radius: float = 4.0, height: float = 1.0,
                      img_wh=(64, 48), focal: float = 60.0):
    """Synthetic cameras on a ring looking at the origin."""
    c2ws = []
    for i in range(n):
        ang = 2 * np.pi * i / n
        pos = np.array([radius * np.cos(ang), radius * np.sin(ang), height])
        forward = -pos / np.linalg.norm(pos)       # toward origin
        up = np.array([0.0, 0.0, 1.0])
        right = np.cross(forward, up)
        right /= np.linalg.norm(right)
        true_up = np.cross(right, forward)
        # OpenGL/nerfstudio: z is backward
        rot = np.stack([right, true_up, -forward], axis=-1)
        c2w = np.concatenate([rot, pos[:, None]], axis=-1)
        c2ws.append(c2w)
    c2w = np.stack(c2ws).astype(np.float32)
    w, h = img_wh
    n_cam = len(c2w)
    intri = np.zeros((n_cam, 3, 3), np.float32)
    intri[:, 0, 0] = focal
    intri[:, 1, 1] = focal
    intri[:, 0, 2] = w / 2
    intri[:, 1, 2] = h / 2
    intri[:, 2, 2] = 1
    return c2w, intri


@pytest.fixture
def ring_cameras():
    return make_ring_cameras()
