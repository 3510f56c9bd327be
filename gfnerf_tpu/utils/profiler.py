"""Function-level profiler.

Port of ``nerfstudio/utils/profiler.py``: a ``@time_function`` decorator
accumulating running-average durations per qualified name, printed at exit,
plus a hook into ``jax.profiler`` for device traces.
"""

from __future__ import annotations

import atexit
import functools
import time
from typing import Dict

PROFILER_ENABLED = False
_STATS: Dict[str, list] = {}


def enable_profiler(enabled: bool = True):
    global PROFILER_ENABLED
    PROFILER_ENABLED = enabled


def time_function(fn):
    name = f"{fn.__module__}.{fn.__qualname__}"

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        if not PROFILER_ENABLED:
            return fn(*args, **kwargs)
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        dt = time.perf_counter() - t0
        avg, n = _STATS.get(name, (0.0, 0))
        _STATS[name] = ((avg * n + dt) / (n + 1), n + 1)
        return out

    return wrapper


@atexit.register
def print_profile():
    if not _STATS:
        return
    print("\n[profiler] running averages:")
    for name, (avg, n) in sorted(_STATS.items(), key=lambda kv: -kv[1][0]):
        print(f"  {name}: {avg*1e3:.2f} ms (n={n})")


def start_device_trace(log_dir: str):
    """jax.profiler trace (TPU timeline in tensorboard)."""
    import jax

    jax.profiler.start_trace(log_dir)


def stop_device_trace():
    import jax

    jax.profiler.stop_trace()
