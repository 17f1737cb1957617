"""Pallas PG kernel tests — run only on real TPU (PYGLM_TEST_TPU=1);
the kernel has no CPU lowering. The CPU suite covers the XLA sampler the
kernel's continuation reuses."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("PYGLM_TEST_TPU"), reason="TPU-only kernel")


@pytest.mark.parametrize("c", [0.0, 0.5, 1.5, 4.0, 12.0])
def test_pallas_moments(c):
    from pyglm_tpu.ops.pg_pallas import pg_devroye_pallas
    from pyglm_tpu.ops.polyagamma import pg_mean, pg_var
    cs = jnp.full((300_000,), c, jnp.float32)
    s = np.asarray(pg_devroye_pallas(jax.random.key(int(c * 10) + 3), cs),
                   np.float64)
    m, v = float(pg_mean(1.0, c)), float(pg_var(1.0, c))
    assert np.all(np.isfinite(s)) and np.all(s > 0)
    z = abs(s.mean() - m) / np.sqrt(v / s.size)
    assert z < 6.0, (s.mean(), m, z)


def test_pallas_vs_xla_ks():
    from pyglm_tpu.ops.pg_pallas import pg_devroye_pallas
    from pyglm_tpu.ops.polyagamma import pg_devroye
    n = 100_000
    c = jnp.full((n,), 1.0, jnp.float32)
    s1 = np.sort(np.asarray(pg_devroye_pallas(jax.random.key(0), c), np.float64))
    s2 = np.sort(np.asarray(pg_devroye(jax.random.key(1), c), np.float64))
    grid = np.concatenate([s1, s2])
    ks = np.max(np.abs(np.searchsorted(s1, grid, side="right") / n
                       - np.searchsorted(s2, grid, side="right") / n))
    assert ks < 1.95 * np.sqrt(2.0 / n), ks


@pytest.mark.parametrize("b,c", [
    (0.3, 1.0), (1.0, 2.0), (2.5, 0.0), (13.0, 1.0), (40.0, 6.0)])
def test_gamma_pallas_moments(b, c):
    from pyglm_tpu.ops.pg_pallas import pg_gamma_series_pallas
    from pyglm_tpu.ops.polyagamma import pg_mean, pg_var
    bs = jnp.full((300_000,), b, jnp.float32)
    cs = jnp.full((300_000,), c, jnp.float32)
    s = np.asarray(pg_gamma_series_pallas(
        jax.random.key(hash(("gp", b, c)) % 2**31), bs, cs), np.float64)
    m, v = float(pg_mean(b, c)), float(pg_var(b, c))
    assert np.all(np.isfinite(s)) and np.all(s > 0)
    z = abs(s.mean() - m) / np.sqrt(v / s.size)
    assert z < 6.0, (s.mean(), m, z)


def test_gamma_pallas_vs_xla_ks():
    from pyglm_tpu.ops.pg_pallas import pg_gamma_series_pallas
    from pyglm_tpu.ops.polyagamma import pg_gamma_series
    n = 100_000
    b = jnp.full((n,), 3.5, jnp.float32)
    c = jnp.full((n,), 1.0, jnp.float32)
    s1 = np.sort(np.asarray(pg_gamma_series_pallas(jax.random.key(0), b, c),
                            np.float64))
    s2 = np.sort(np.asarray(pg_gamma_series(jax.random.key(1), b, c),
                            np.float64))
    grid = np.concatenate([s1, s2])
    ks = np.max(np.abs(np.searchsorted(s1, grid, side="right") / n
                       - np.searchsorted(s2, grid, side="right") / n))
    assert ks < 1.95 * np.sqrt(2.0 / n), ks


def test_gamma_pallas_mixed_b_shapes():
    from pyglm_tpu.ops.pg_pallas import pg_gamma_series_pallas
    rng = np.random.RandomState(0)
    b = jnp.asarray(rng.poisson(2.0, (317,)) + 0.4, jnp.float32)
    c = jnp.asarray(rng.randn(317), jnp.float32)
    s = np.asarray(pg_gamma_series_pallas(jax.random.key(2), b, c))
    assert s.shape == (317,) and np.all(np.isfinite(s)) and np.all(s > 0)


def test_gram_pallas_matches_xla():
    from pyglm_tpu.ops.gram_pallas import group_gram_blocks_pallas
    from pyglm_tpu.models.weights import group_gram_blocks
    rng = np.random.RandomState(0)
    T, N, B, G = 3000, 16, 2, 4          # GB = 8
    P = N * B + 1
    Xf = jnp.asarray((rng.rand(T, P) * (rng.rand(T, P) < 0.3)).astype(np.float32))
    omega = jnp.asarray(rng.rand(T, N).astype(np.float32) + 0.05)
    b = np.asarray(group_gram_blocks(Xf, omega, B, G, t_chunk=256,
                                     precision="highest"), np.float64)
    scale = np.abs(b).max()
    # bf16x3 kernel (precision='high' path): f32-grade
    a = np.asarray(group_gram_blocks_pallas(Xf, omega, B, G, t_chunk=256,
                                            fast=False), np.float64)
    assert np.abs(a - b).max() / scale < 5e-6, np.abs(a - b).max() / scale
    assert a.shape == (N // G, N, G * B, G * B)
    # single-bf16 kernel (speed mode): ~8e-4 relative
    af = np.asarray(group_gram_blocks_pallas(Xf, omega, B, G, t_chunk=256,
                                             fast=True), np.float64)
    assert np.abs(af - b).max() / scale < 5e-3, np.abs(af - b).max() / scale


def test_crt_kernel_matches_xla():
    """CRT table counts: the fused kernel's distribution must match the
    XLA path's (exact Bernoulli-sum law; mean/var within MC tolerance)."""
    from pyglm_tpu.ops.pg_pallas import crt_sample_pallas
    from pyglm_tpu.ops.linalg import crt_sample
    n = 200_000
    for y_val, r_val in [(1, 0.5), (4, 2.0), (12, 5.0), (15, 0.7)]:
        y = jnp.full((n,), y_val, jnp.int32)
        r = jnp.full((n,), float(r_val))
        lp = np.asarray(crt_sample_pallas(jax.random.key(1), y, r, 16))
        # exact law: mean = sum_i r/(r+i), var = sum p(1-p)
        ps = np.array([r_val / (r_val + i) for i in range(y_val)])
        m, v = ps.sum(), (ps * (1 - ps)).sum()
        se = np.sqrt(v / n) + 1e-6
        assert abs(lp.mean() - m) < 6 * se + 1e-3, (y_val, r_val, lp.mean(), m)
        if v > 1e-6:
            assert abs(lp.var() / v - 1) < 0.05, (y_val, r_val, lp.var(), v)
