"""Standalone PG regression tests (pypolyagamma.distributions parity)."""
import numpy as np
import jax
import pytest
import jax.numpy as jnp

from pyglm_tpu.models.regressions import (
    BernoulliRegression, BinomialRegression, NegativeBinomialRegression,
    MultinomialRegression,
)
from pyglm_tpu.compat import PyPolyaGamma, pgdrawvpar


def _fit(reg, X, y, n=60):
    lls = []
    for _ in range(n):
        reg.resample([(X, y)])
        lls.append(float(np.sum(reg.log_likelihood((X, y)))))
    return lls


@pytest.mark.slow
def test_bernoulli_regression_recovers_weights():
    rng = np.random.RandomState(0)
    T, D = 4000, 3
    X = rng.randn(T, D).astype(np.float32)
    A_true = np.array([[1.5, -1.0, 0.5]], np.float32)
    psi = X @ A_true.T + 0.3
    y = (rng.rand(T, 1) < 1 / (1 + np.exp(-psi))).astype(np.float32)
    reg = BernoulliRegression(1, D, seed=1)
    _fit(reg, X, y, 40)
    A_avg = np.zeros_like(A_true)
    for _ in range(20):
        reg.resample([(X, y)])
        A_avg += reg.A / 20
    np.testing.assert_allclose(A_avg, A_true, atol=0.3)


@pytest.mark.slow
def test_binomial_regression_runs():
    rng = np.random.RandomState(1)
    X = rng.randn(800, 2).astype(np.float32)
    reg0 = BinomialRegression(10, 1, 2, seed=0)
    y = reg0.rvs(X)
    assert y.shape == (800, 1) and y.max() <= 10
    reg = BinomialRegression(10, 1, 2, seed=3)
    lls = _fit(reg, X, y, 30)
    assert lls[-1] > lls[0]


@pytest.mark.slow
def test_nb_regression_r_recovery():
    rng = np.random.RandomState(2)
    X = np.zeros((4000, 1), np.float32)
    true = NegativeBinomialRegression(1, 1, r=7.0, resample_r=False, seed=0)
    true.A[:] = 0.0
    true.b[:] = -0.3
    y = true.rvs(X)
    reg = NegativeBinomialRegression(1, 1, r=2.0, max_y=int(y.max()) + 1, seed=5)
    for _ in range(40):
        reg.resample([(X, y)])
    # r and b are only jointly identified through mean r*e^b and the shape;
    # check the implied mean matches.
    mean_est = reg.r[0] * np.exp(reg.b[0])
    mean_true = 7.0 * np.exp(-0.3)
    assert abs(mean_est - mean_true) / mean_true < 0.2
    assert 1.0 < reg.r[0] < 40.0


@pytest.mark.slow
def test_multinomial_regression():
    rng = np.random.RandomState(3)
    T, D, K = 3000, 2, 4
    X = rng.randn(T, D).astype(np.float32)
    true = MultinomialRegression(K, D, seed=0)
    y = true.rvs(X, n_trials=5)
    assert y.shape == (T, K)
    np.testing.assert_allclose(y.sum(-1), 5.0)
    reg = MultinomialRegression(K, D, seed=9)
    lls = _fit(reg, X, y, 40)
    assert np.mean(lls[-5:]) > lls[0]
    pi = np.asarray(reg.pi(X))
    np.testing.assert_allclose(pi.sum(-1), 1.0, atol=1e-5)


@pytest.mark.slow
def test_pypolyagamma_compat_surface():
    ppg = PyPolyaGamma(seed=42)
    x = ppg.pgdraw(1.0, 0.5)
    assert x > 0
    ns = np.ones(1000)
    zs = np.full(1000, 1.0)
    out = np.zeros(1000)
    ppg.pgdrawv(ns, zs, out)
    assert np.all(out > 0)
    assert abs(out.mean() - np.tanh(0.5) / 2) < 0.02
    # pgdrawvpar: list-of-generators signature
    out2 = np.zeros(1000)
    pgdrawvpar([PyPolyaGamma(1), PyPolyaGamma(2)], ns, zs, out2)
    assert np.all(out2 > 0) and not np.array_equal(out, out2)
    # per-generator streams (reference OpenMP static-schedule semantics):
    # each contiguous chunk must reproduce ITS generator's own pgdrawv,
    # so a given (seed list, inputs) pair is bitwise reproducible
    chunk1 = PyPolyaGamma(1).pgdrawv(ns[:500], zs[:500])
    chunk2 = PyPolyaGamma(2).pgdrawv(ns[500:], zs[500:])
    np.testing.assert_array_equal(out2, np.concatenate([chunk1, chunk2]))
    # mixed b dispatch
    ns_mixed = np.asarray([1.0, 3.5, 100.0])
    out3 = ppg.pgdrawv(ns_mixed, np.ones(3))
    assert np.all(out3 > 0)
