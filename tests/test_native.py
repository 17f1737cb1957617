"""Native C++ PG sampler: build, correctness, and cross-implementation
agreement with the JAX sampler (independent oracle check)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pyglm_tpu.native import native_available, pg_devroye_native, pg_int_b_native

pytestmark = pytest.mark.skipif(
    not native_available(), reason="no C++ toolchain")


def _true_moments(b, c):
    if abs(c) < 1e-8:
        return b / 4.0, b / 24.0
    t = np.tanh(c / 2)
    return b / (2 * c) * t, b * (2 * t - c * (1 - t * t)) / (4 * c ** 3)


@pytest.mark.parametrize("c", [0.0, 0.5, 2.0, 10.0])
def test_native_moments(c):
    s = pg_devroye_native(np.full(100_000, c), seed=int(c * 7) + 1)
    m, v = _true_moments(1.0, c)
    assert np.all(s > 0)
    z = abs(s.mean() - m) / np.sqrt(v / s.size)
    assert z < 6.0, (s.mean(), m, z)
    assert abs(s.var() / v - 1) < 0.05


def test_native_int_b():
    s = pg_int_b_native(np.full(50_000, 3.0), 1.0, seed=9)
    m, v = _true_moments(3.0, 1.0)
    z = abs(s.mean() - m) / np.sqrt(v / s.size)
    assert z < 6.0


def test_native_vs_jax_ks():
    """Two independent implementations (C++ mt19937 vs JAX threefry) must
    produce the same distribution — the strongest sampler cross-check."""
    from pyglm_tpu.ops.polyagamma import pg_devroye
    n = 100_000
    s_cpp = np.sort(pg_devroye_native(np.full(n, 1.2), seed=3))
    s_jax = np.sort(np.asarray(
        pg_devroye(jax.random.key(4), jnp.full((n,), 1.2)), np.float64))
    grid = np.concatenate([s_cpp, s_jax])
    ks = np.max(np.abs(np.searchsorted(s_cpp, grid, side="right") / n
                       - np.searchsorted(s_jax, grid, side="right") / n))
    assert ks < 1.95 * np.sqrt(2.0 / n), ks


def test_native_deterministic_per_seed():
    a = pg_devroye_native(np.ones(100), seed=5, n_threads=2)
    b = pg_devroye_native(np.ones(100), seed=5, n_threads=2)
    c = pg_devroye_native(np.ones(100), seed=6, n_threads=2)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)
