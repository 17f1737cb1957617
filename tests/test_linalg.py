import numpy as np
import jax
import jax.numpy as jnp

from pyglm_tpu.ops.linalg import (
    sample_mvn_info, gaussian_evidence, sample_from_evidence,
    sample_invwishart, NIWParams, niw_posterior, sample_niw,
    sample_inverse_gamma, crt_sample,
)


def test_sample_mvn_info_moments():
    rng = np.random.RandomState(0)
    A = rng.randn(3, 3)
    Lam = jnp.asarray(A @ A.T + 3 * np.eye(3), jnp.float32)
    h = jnp.asarray(rng.randn(3), jnp.float32)
    mu = np.linalg.solve(np.asarray(Lam), np.asarray(h))
    cov = np.linalg.inv(np.asarray(Lam))
    keys = jax.random.split(jax.random.key(0), 20000)
    xs = np.asarray(jax.vmap(lambda k: sample_mvn_info(k, h, Lam))(keys))
    np.testing.assert_allclose(xs.mean(0), mu, atol=4 * np.sqrt(cov.max() / 20000) + 0.02)
    np.testing.assert_allclose(np.cov(xs.T), cov, atol=0.03)


def test_gaussian_evidence_closed_form():
    """Evidence against brute-force 1-D quadrature."""
    m = jnp.asarray([0.7]); J = jnp.asarray([[2.0]])
    mu0 = jnp.asarray([0.3]); Lam0 = jnp.asarray([[1.5]])
    ev = gaussian_evidence(m, J, mu0, Lam0)
    w = np.linspace(-10, 10, 200001)
    dw = w[1] - w[0]
    prior = np.exp(-0.5 * 1.5 * (w - 0.3) ** 2) * np.sqrt(1.5 / (2 * np.pi))
    lik = np.exp(0.7 * w - 0.5 * 2.0 * w ** 2)
    log_ev_num = np.log(np.sum(prior * lik) * dw)
    np.testing.assert_allclose(float(ev.log_evidence), log_ev_num, atol=1e-4)
    # posterior mean/precision
    np.testing.assert_allclose(float(ev.mu_post[0]), (0.7 + 1.5 * 0.3) / 3.5, rtol=1e-5)
    xs = np.asarray(jax.vmap(lambda k: sample_from_evidence(k, ev))(
        jax.random.split(jax.random.key(1), 20000)))
    np.testing.assert_allclose(xs.var(), 1 / 3.5, rtol=0.05)


def test_invwishart_mean():
    Psi = jnp.asarray([[2.0, 0.3], [0.3, 1.0]], jnp.float32)
    nu = 10.0
    keys = jax.random.split(jax.random.key(2), 4000)
    Ss = np.asarray(jax.vmap(lambda k: sample_invwishart(k, nu, Psi))(keys))
    # E[IW(nu, Psi)] = Psi / (nu - d - 1)
    np.testing.assert_allclose(Ss.mean(0), np.asarray(Psi) / (nu - 3), rtol=0.1)


def test_niw_posterior_and_sample():
    p = NIWParams(mu0=jnp.zeros(2), kappa0=jnp.asarray(1.0),
                  nu0=jnp.asarray(5.0), Psi0=jnp.eye(2))
    rng = np.random.RandomState(3)
    X = rng.randn(500, 2) * 0.5 + np.array([1.0, -2.0])
    xbar = X.mean(0)
    S = (X - xbar).T @ (X - xbar)
    post = niw_posterior(p, X.shape[0], jnp.asarray(xbar, jnp.float32),
                         jnp.asarray(S, jnp.float32))
    assert float(post.kappa0) == 501.0 and float(post.nu0) == 505.0
    keys = jax.random.split(jax.random.key(4), 2000)
    mus, Sigmas = jax.vmap(lambda k: sample_niw(k, post))(keys)
    np.testing.assert_allclose(np.asarray(mus).mean(0), xbar, atol=0.05)
    np.testing.assert_allclose(np.asarray(Sigmas).mean(0),
                               S / 505.0 + np.eye(2) / 505.0, rtol=0.15, atol=0.01)


def test_niw_posterior_zero_count_returns_prior():
    p = NIWParams(mu0=jnp.ones(2), kappa0=jnp.asarray(2.0),
                  nu0=jnp.asarray(5.0), Psi0=jnp.eye(2))
    post = niw_posterior(p, 0.0, jnp.zeros(2), jnp.zeros((2, 2)))
    np.testing.assert_allclose(np.asarray(post.mu0), np.ones(2))
    np.testing.assert_allclose(np.asarray(post.Psi0), np.eye(2), atol=1e-6)


def test_inverse_gamma_mean():
    keys = jax.random.split(jax.random.key(5), 20000)
    xs = np.asarray(jax.vmap(lambda k: sample_inverse_gamma(k, 5.0, 2.0))(keys))
    np.testing.assert_allclose(xs.mean(), 2.0 / 4.0, rtol=0.05)


def test_crt_expectation():
    # y=2: l = 1 + Bern(r/(r+1)); E[l] = 1 + r/(r+1)
    r = 3.0
    y = jnp.full((50000,), 2, jnp.int32)
    l = np.asarray(crt_sample(jax.random.key(6), y, r, max_y=4))
    np.testing.assert_allclose(l.mean(), 1 + r / (r + 1), rtol=0.02)
    # y=0 -> l=0; y=1 -> l=1 exactly
    l0 = np.asarray(crt_sample(jax.random.key(7), jnp.zeros((100,), jnp.int32), r, 4))
    l1 = np.asarray(crt_sample(jax.random.key(8), jnp.ones((100,), jnp.int32), r, 4))
    assert np.all(l0 == 0) and np.all(l1 == 1)


def test_unrolled_small_cholesky_and_solves():
    """chol_small / solve_lower_small / solve_lower_t_small (the fused
    forms used by the spike-slab edge scan) must match jnp.linalg /
    solve_triangular for every supported B."""
    from jax.scipy.linalg import solve_triangular
    from pyglm_tpu.ops.linalg import (
        chol_small, solve_lower_small, solve_lower_t_small)
    rng = np.random.RandomState(0)
    for B in [1, 2, 3, 4, 8]:
        X = rng.randn(40, B, B)
        A = jnp.asarray(X @ X.transpose(0, 2, 1) + 3 * np.eye(B), jnp.float32)
        b = jnp.asarray(rng.randn(40, B), jnp.float32)
        L_ref = jnp.linalg.cholesky(A)
        np.testing.assert_allclose(chol_small(A), L_ref, rtol=2e-5, atol=2e-5)
        y_ref = solve_triangular(L_ref, b[..., None], lower=True)[..., 0]
        np.testing.assert_allclose(solve_lower_small(L_ref, b), y_ref,
                                   rtol=2e-4, atol=2e-5)
        z_ref = solve_triangular(jnp.swapaxes(L_ref, -1, -2), b[..., None],
                                 lower=False)[..., 0]
        np.testing.assert_allclose(solve_lower_t_small(L_ref, b), z_ref,
                                   rtol=2e-4, atol=2e-5)
    # B > cap falls back to the library routines
    X = rng.randn(4, 12, 12)
    A = jnp.asarray(X @ X.transpose(0, 2, 1) + 5 * np.eye(12), jnp.float32)
    np.testing.assert_allclose(chol_small(A), jnp.linalg.cholesky(A),
                               rtol=2e-5, atol=2e-5)
