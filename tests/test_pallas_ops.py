"""Pallas kernel golden tests (run on CPU via the reference fallback; the
TPU path is exercised by the verify drive / bench)."""

import numpy as np
import jax
import jax.numpy as jnp

from gfnerf_tpu.ops.pallas.composite import (_composite_reference,
                                             fused_composite)


def test_fused_composite_matches_reference():
    rng = np.random.default_rng(0)
    r, s = 16, 64
    dens = jnp.asarray(rng.random((r, s)) * 5, jnp.float32)
    dts = jnp.asarray(rng.random((r, s)) * 0.01, jnp.float32)
    ts = jnp.asarray(np.cumsum(rng.random((r, s)), -1), jnp.float32)
    rgbs = jnp.asarray(rng.random((r, s, 3)), jnp.float32)

    got = fused_composite(dens, dts, ts, rgbs)
    want = _composite_reference(dens, dts, ts, rgbs)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-4, atol=1e-5)


def test_fused_composite_gradients():
    rng = np.random.default_rng(1)
    r, s = 8, 32
    dens = jnp.asarray(rng.random((r, s)), jnp.float32)
    dts = jnp.asarray(rng.random((r, s)) * 0.1, jnp.float32)
    ts = jnp.asarray(np.cumsum(rng.random((r, s)), -1), jnp.float32)
    rgbs = jnp.asarray(rng.random((r, s, 3)), jnp.float32)

    def loss_fused(d):
        w, a, rgb, acc, depth = fused_composite(d, dts, ts, rgbs)
        return jnp.sum(rgb ** 2) + jnp.sum(depth)

    def loss_ref(d):
        w, a, rgb, acc, depth = _composite_reference(d, dts, ts, rgbs)
        return jnp.sum(rgb ** 2) + jnp.sum(depth)

    g1 = jax.grad(loss_fused)(dens)
    g2 = jax.grad(loss_ref)(dens)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4,
                               atol=1e-5)


def test_fused_composite_bwd_kernel_matches_reference_vjp():
    """The Pallas backward kernel (interpret mode on CPU) must reproduce the
    jnp reference VJP for every input and every output cotangent."""
    from gfnerf_tpu.ops.pallas.composite import _composite_bwd_pallas

    rng = np.random.default_rng(2)
    r, s = 16, 64
    dens = jnp.asarray(rng.random((r, s)) * 5, jnp.float32)
    dts = jnp.asarray(rng.random((r, s)) * 0.01 + 1e-3, jnp.float32)
    ts = jnp.asarray(np.cumsum(rng.random((r, s)), -1), jnp.float32)
    rgbs = jnp.asarray(rng.random((r, s, 3)), jnp.float32)
    g = (jnp.asarray(rng.normal(size=(r, s)), jnp.float32),      # d w
         jnp.asarray(rng.normal(size=(r, s)), jnp.float32),      # d alphas
         jnp.asarray(rng.normal(size=(r, 3)), jnp.float32),      # d rgb
         jnp.asarray(rng.normal(size=(r, 1)), jnp.float32),      # d acc
         jnp.asarray(rng.normal(size=(r, 1)), jnp.float32))      # d depth

    _, vjp = jax.vjp(_composite_reference, dens, dts, ts, rgbs)
    want = vjp(g)
    got = _composite_bwd_pallas(dens, dts, ts, rgbs, g, interpret=True)
    for gname, a, b in zip(("dens", "dts", "ts", "rgbs"), got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3,
                                   atol=2e-5, err_msg=gname)


def _rand_inputs(rng, r, s):
    dens = jnp.asarray(rng.random((r, s)) * 5, jnp.float32)
    dts = jnp.asarray(rng.random((r, s)) * 0.01 + 1e-3, jnp.float32)
    ts = jnp.asarray(np.cumsum(rng.random((r, s)), -1), jnp.float32)
    rgbs = jnp.asarray(rng.random((r, s, 3)), jnp.float32)
    return dens, dts, ts, rgbs


def test_fused_composite_fwd_kernel_nonpow2_pad_path():
    """Interpret-mode forward through _composite_pallas at non-pow2 S
    exercises the zero-pad + output-slice branches against the reference."""
    import jax.experimental.pallas as pl  # noqa: F401 (skip if unavailable)
    from gfnerf_tpu.ops.pallas import composite as C

    rng = np.random.default_rng(3)
    for s in (48, 384):
        dens, dts, ts, rgbs = _rand_inputs(rng, 16, s)
        want = C._composite_reference(dens, dts, ts, rgbs)
        orig = pl.pallas_call
        try:  # force interpret=True so the kernel runs on CPU
            pl.pallas_call = lambda *a, **k: orig(
                *a, **{**k, "interpret": True})
            got = C._composite_pallas(dens, dts, ts, rgbs)
        finally:
            pl.pallas_call = orig
        for name, a, b in zip(("w", "alphas", "rgb", "acc", "depth"),
                              got, want):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5,
                                       err_msg=f"S={s} {name}")


def test_fused_composite_bwd_kernel_nonpow2_pad_path():
    """Backward kernel at S=48 and S=384 (pads to 64/512): the padded slots
    must not perturb any gradient, and outputs must slice back exactly."""
    from gfnerf_tpu.ops.pallas.composite import _composite_bwd_pallas

    rng = np.random.default_rng(4)
    for s in (48, 384):
        r = 8
        dens, dts, ts, rgbs = _rand_inputs(rng, r, s)
        g = (jnp.asarray(rng.normal(size=(r, s)), jnp.float32),
             jnp.asarray(rng.normal(size=(r, s)), jnp.float32),
             jnp.asarray(rng.normal(size=(r, 3)), jnp.float32),
             jnp.asarray(rng.normal(size=(r, 1)), jnp.float32),
             jnp.asarray(rng.normal(size=(r, 1)), jnp.float32))
        _, vjp = jax.vjp(_composite_reference, dens, dts, ts, rgbs)
        want = vjp(g)
        got = _composite_bwd_pallas(dens, dts, ts, rgbs, g, interpret=True)
        for gname, a, b in zip(("dens", "dts", "ts", "rgbs"), got, want):
            assert a.shape == b.shape, (gname, a.shape, b.shape)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=2e-5,
                                       err_msg=f"S={s} {gname}")
