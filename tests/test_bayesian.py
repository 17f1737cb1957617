"""pybasicbayes-parity layer: NIW Gaussian and MNIW Regression."""
import numpy as np
import pytest

from pyglm_tpu.models.bayesian import Gaussian, Regression
from pyglm_tpu.models.abstractions import GibbsSampling, ModelGibbsSampling


@pytest.mark.slow
def test_gaussian_posterior_concentrates():
    rng = np.random.RandomState(0)
    X = rng.randn(2000, 2) * [0.5, 2.0] + [1.0, -3.0]
    g = Gaussian(D=2, seed=1)
    mus, sigs = [], []
    for _ in range(50):
        g.resample(X)
        mus.append(g.mu)
        sigs.append(g.sigma)
    mu_hat = np.mean(mus[10:], axis=0)
    sig_hat = np.mean(sigs[10:], axis=0)
    np.testing.assert_allclose(mu_hat, [1.0, -3.0], atol=0.15)
    np.testing.assert_allclose(np.diag(sig_hat), [0.25, 4.0], rtol=0.2)
    # log_likelihood sane vs scipy
    from scipy.stats import multivariate_normal
    ll = g.log_likelihood(X[:5])
    ll_ref = multivariate_normal.logpdf(X[:5], g.mu, g.sigma)
    np.testing.assert_allclose(ll, ll_ref, rtol=1e-3, atol=1e-3)
    # rvs moments
    s = g.rvs(20000)
    np.testing.assert_allclose(s.mean(0), g.mu, atol=4 * np.sqrt(
        np.diag(g.sigma).max() / 20000) + 0.05)


def test_gaussian_prior_resample_matches_prior():
    g = Gaussian(D=2, kappa_0=2.0, nu_0=6.0, seed=2)
    mus = []
    for _ in range(300):
        g.resample(None)
        mus.append(g.mu.copy())
    mus = np.asarray(mus)
    # prior: mu | Sigma ~ N(0, Sigma/2), Sigma ~ IW(6, I): E[Sigma]=I/3
    assert abs(mus.mean()) < 0.1
    np.testing.assert_allclose(mus.var(0), 1 / 3 / 2, rtol=0.5)


def test_regression_recovers_linear_map():
    rng = np.random.RandomState(1)
    A_true = np.array([[2.0, -1.0], [0.5, 1.5]])
    b_true = np.array([0.3, -0.7])
    X = rng.randn(3000, 2)
    Y = X @ A_true.T + b_true + 0.1 * rng.randn(3000, 2)
    reg = Regression(D_out=2, D_in=2, seed=0)
    As = []
    for _ in range(40):
        reg.resample((X, Y))
        As.append(reg.A.copy())
    A_hat = np.mean(As[10:], axis=0)
    np.testing.assert_allclose(A_hat[:, :2], A_true, atol=0.05)
    np.testing.assert_allclose(A_hat[:, 2], b_true, atol=0.05)
    np.testing.assert_allclose(np.diag(reg.sigma), [0.01, 0.01], rtol=0.5)
    # predictive draws near the regression plane
    Yp = reg.rvs(X[:100])
    assert np.abs(Yp - (X[:100] @ A_true.T + b_true)).mean() < 0.5
    # log_likelihood matches manual Gaussian
    ll = reg.log_likelihood((X[:3], Y[:3]))
    assert np.all(np.isfinite(ll)) and ll.shape == (3,)


@pytest.mark.slow
def test_abstractions_contract():
    assert isinstance(Gaussian(D=2), GibbsSampling)
    import pyglm_tpu as pt
    # the GLM satisfies the ModelGibbsSampling duck-type surface
    m = pt.SparseBernoulliGLM(3, B=2, L=3)
    for name in ("add_data", "generate", "resample_model", "log_likelihood"):
        assert callable(getattr(m, name))


@pytest.mark.slow
def test_diagonal_regression():
    from pyglm_tpu.models.bayesian import DiagonalRegression
    rng = np.random.RandomState(3)
    X = rng.randn(2000, 3)
    A_true = np.array([[1.0, -0.5, 2.0], [0.0, 1.0, -1.0]])
    Y = X @ A_true.T + [0.5, -0.5] + rng.randn(2000, 2) * [0.3, 1.0]
    reg = DiagonalRegression(D_out=2, D_in=3, seed=0)
    As, s2s = [], []
    for _ in range(40):
        reg.resample((X, Y))
        As.append(reg.A.copy())
        s2s.append(reg.sigmasq.copy())
    A_hat = np.mean(As[10:], 0)
    np.testing.assert_allclose(A_hat[:, :3], A_true, atol=0.1)
    np.testing.assert_allclose(A_hat[:, 3], [0.5, -0.5], atol=0.1)
    np.testing.assert_allclose(np.mean(s2s[10:], 0), [0.09, 1.0], rtol=0.3)
    ll = reg.log_likelihood((X[:4], Y[:4]))
    assert ll.shape == (4,) and np.all(np.isfinite(ll))
    assert reg.rvs(X[:5]).shape == (5, 2)
