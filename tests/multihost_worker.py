"""Worker process for the two-process multi-host validation test.

Launched by ``tests/test_multihost.py`` (NOT collected by pytest — no
``test_`` prefix).  Each worker is one emulated "host": its own Python
process with 4 virtual CPU devices, joined to the other through
``jax.distributed`` exactly the way real multi-host TPU pods are.  This
exercises for real what the reference brings up with
``dist.init_process_group(backend="nccl", ...)``
(/root/reference/nerfstudio/scripts/train.py:124-137): the coordination
service, the global (cross-process) device view, process-spanning meshes,
cross-host collectives, and our DCN-aware block mesh layout.

Usage: python multihost_worker.py <proc_id> <n_proc> <port> <out_json>
"""

import json
import os
import sys


def main() -> None:
    proc_id = int(sys.argv[1])
    n_proc = int(sys.argv[2])
    port = sys.argv[3]
    out = sys.argv[4]

    # Must be set before jax initializes a backend: 4 virtual CPU devices
    # per process (the test launcher already scrubbed XLA_FLAGS/PYTHONPATH).
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    from gfnerf_tpu.parallel.sharding import (
        initialize_multihost,
        make_multihost_mesh,
    )

    initialize_multihost(f"127.0.0.1:{port}", n_proc, proc_id)
    assert jax.process_count() == n_proc, jax.process_count()
    assert len(jax.local_devices()) == 4
    assert len(jax.devices()) == 4 * n_proc, jax.devices()

    # --- 1) pure-DP mesh spanning every host: per-process local batches
    # assemble into one global array (the make_dp_train_step input path),
    # and a jitted global reduction runs a cross-host collective.
    mesh = make_multihost_mesh(n_block=1)
    assert mesh.devices.shape == (4 * n_proc, 1)
    spec = NamedSharding(mesh, P("data"))
    local = (np.arange(4 * 16, dtype=np.float32).reshape(4, 16)
             + 1000.0 * proc_id)
    garr = jax.make_array_from_process_local_data(
        spec, local, (4 * n_proc, 16))
    total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(garr)
    expect = sum(
        float(np.arange(64, dtype=np.float32).sum()) + 1000.0 * p * 64
        for p in range(n_proc)
    )
    assert abs(float(total) - expect) < 1e-3, (float(total), expect)

    # --- 2) explicit cross-host psum via shard_map (the gradient-sync
    # primitive make_dp_train_step relies on).
    ones = jax.make_array_from_process_local_data(
        spec, np.full((4, 16), 1.0 + proc_id, np.float32), (4 * n_proc, 16))

    def _psum(x):
        return jax.lax.psum(jnp.sum(x), axis_name="data")

    summed = jax.jit(
        jax.shard_map(_psum, mesh=mesh, in_specs=P("data"), out_specs=P()),
    )(ones)
    psum_expect = sum(64.0 * (1.0 + p) for p in range(n_proc))
    assert abs(float(summed) - psum_expect) < 1e-3, (
        float(summed), psum_expect)

    # --- 3) DCN-aware layout claim: with n_block == n_proc, each focal
    # block's device column lives entirely on ONE host, so the every-step
    # data-axis gradient psum never crosses the (slow) DCN.
    mesh2 = make_multihost_mesh(n_block=n_proc)
    assert mesh2.devices.shape == (4, n_proc)
    col_procs = []
    for b in range(n_proc):
        procs = {d.process_index for d in mesh2.devices[:, b]}
        assert len(procs) == 1, f"block {b} spans processes {procs}"
        col_procs.append(procs.pop())
    assert sorted(col_procs) == list(range(n_proc))

    if proc_id == 0:
        with open(out, "w") as f:
            json.dump({
                "ok": True,
                "processes": n_proc,
                "global_devices": len(jax.devices()),
                "dp_sum": float(total),
                "psum": float(summed),
            }, f)


if __name__ == "__main__":
    main()
