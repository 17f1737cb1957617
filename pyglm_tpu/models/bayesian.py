"""Conjugate Bayesian building blocks: NIW Gaussian and MNIW linear
regression.

Capability parity with the reference's Bayesian-primitives layer
(``pybasicbayes/distributions/gaussian.py`` (Gaussian w/ NIW prior) and
``pybasicbayes/distributions/regression.py`` (Regression w/ matrix-normal-
inverse-Wishart prior) — the used subset, SURVEY.md §2.3), as pure-JAX
conjugate updates.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from pyglm_tpu.models.abstractions import GibbsSampling
from pyglm_tpu.ops.linalg import (
    NIWParams, niw_posterior, sample_niw, sample_invwishart,
)


class Gaussian(GibbsSampling):
    """Multivariate Gaussian with NIW-conjugate (mu, Sigma) Gibbs updates
    (reference: pybasicbayes.distributions.Gaussian)."""

    def __init__(self, mu_0=None, sigma_0=None, kappa_0=1.0, nu_0=None,
                 D=None, seed: int = 0):
        if mu_0 is None:
            assert D is not None
            mu_0 = np.zeros(D)
        mu_0 = np.asarray(mu_0, np.float32)
        D = mu_0.shape[0]
        sigma_0 = (np.eye(D, dtype=np.float32) if sigma_0 is None
                   else np.asarray(sigma_0, np.float32))
        self.prior = NIWParams(
            mu0=jnp.asarray(mu_0),
            kappa0=jnp.asarray(float(kappa_0)),
            nu0=jnp.asarray(float(nu_0 if nu_0 is not None else D + 2)),
            Psi0=jnp.asarray(sigma_0))
        self._key = jax.random.key(seed)
        self.mu, self.sigma = map(np.asarray, sample_niw(
            self._next_key(), self.prior))

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def resample(self, data=None):
        if data is None or len(data) == 0:
            post = self.prior
        else:
            X = jnp.asarray(np.atleast_2d(data), jnp.float32)
            n = X.shape[0]
            xbar = jnp.mean(X, axis=0)
            S = (X - xbar).T @ (X - xbar)
            post = niw_posterior(self.prior, n, xbar, S)
        mu, sig = sample_niw(self._next_key(), post)
        self.mu, self.sigma = np.asarray(mu), np.asarray(sig)
        return self

    def log_likelihood(self, x):
        x = jnp.asarray(np.atleast_2d(x), jnp.float32)
        D = x.shape[-1]
        C = jnp.linalg.cholesky(jnp.asarray(self.sigma))
        z = jax.scipy.linalg.solve_triangular(
            C, (x - jnp.asarray(self.mu)).T, lower=True)
        logdet = 2 * jnp.sum(jnp.log(jnp.diagonal(C)))
        return np.asarray(-0.5 * jnp.sum(z * z, axis=0)
                          - 0.5 * (logdet + D * jnp.log(2 * jnp.pi)))

    def rvs(self, size: int = 1):
        C = np.linalg.cholesky(self.sigma)
        eps = np.asarray(jax.random.normal(
            self._next_key(), (size, self.mu.shape[0])))
        return self.mu + eps @ C.T


class DiagonalRegression(GibbsSampling):
    """Linear regression with *diagonal* Gaussian noise: per-output-dim
    conjugate Gaussian weights + inverse-gamma variances (reference:
    pybasicbayes.distributions.DiagonalRegression)."""

    def __init__(self, D_out: int, D_in: int, affine: bool = True,
                 mu_w=0.0, sigmasq_w=1.0, alpha_0: float = 2.0,
                 beta_0: float = 1.0, seed: int = 0):
        self.D_out, self.D_in, self.affine = D_out, D_in, affine
        P = D_in + (1 if affine else 0)
        self.mu_w = np.full((D_out, P), mu_w, np.float32)
        self.lam_w = np.full((D_out, P), 1.0 / sigmasq_w, np.float32)
        self.alpha_0, self.beta_0 = float(alpha_0), float(beta_0)
        self._key = jax.random.key(seed)
        k = self._next_key()
        self.A = np.array(self.mu_w + np.asarray(
            jax.random.normal(k, (D_out, P))) / np.sqrt(self.lam_w))
        self.sigmasq = np.full(D_out, beta_0 / max(alpha_0 - 1, 0.5),
                               np.float32)

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def _pad(self, X):
        X = np.atleast_2d(np.asarray(X, np.float32))
        if self.affine:
            X = np.concatenate([X, np.ones((X.shape[0], 1), np.float32)], 1)
        return X

    def resample(self, data):
        from pyglm_tpu.ops.linalg import sample_mvn_info, sample_inverse_gamma
        X, Y = data
        Xp = jnp.asarray(self._pad(X))
        Y = jnp.asarray(np.atleast_2d(np.asarray(Y, np.float32)))
        Tn = Xp.shape[0]
        k1, k2 = jax.random.split(self._next_key())

        def one(kd, y, mu0, lam0, s2):
            J = (Xp.T @ Xp) / s2 + jnp.diag(lam0)
            h = Xp.T @ y / s2 + lam0 * mu0
            return sample_mvn_info(kd, h, J)

        keys = jax.random.split(k1, self.D_out)
        A = jax.vmap(one, in_axes=(0, 1, 0, 0, 0))(
            keys, Y, jnp.asarray(self.mu_w), jnp.asarray(self.lam_w),
            jnp.asarray(self.sigmasq))
        resid = Y - Xp @ A.T
        alpha = self.alpha_0 + 0.5 * Tn
        beta = self.beta_0 + 0.5 * jnp.sum(resid ** 2, axis=0)
        s2 = sample_inverse_gamma(k2, alpha, beta)
        self.A = np.array(A)
        self.sigmasq = np.array(jnp.maximum(s2, 1e-8))
        return self

    def log_likelihood(self, data):
        X, Y = data
        Xp = self._pad(X)
        Y = np.atleast_2d(np.asarray(Y, np.float32))
        resid = Y - Xp @ self.A.T
        return np.sum(-0.5 * np.log(2 * np.pi * self.sigmasq)
                      - 0.5 * resid ** 2 / self.sigmasq, axis=1)

    def rvs(self, X):
        Xp = self._pad(X)
        mean = Xp @ self.A.T
        eps = np.asarray(jax.random.normal(self._next_key(), mean.shape))
        return mean + eps * np.sqrt(self.sigmasq)


class Regression(GibbsSampling):
    """Bayesian linear regression y = A [x; 1] + eps, eps ~ N(0, Sigma),
    with matrix-normal-inverse-Wishart conjugacy (reference:
    pybasicbayes.distributions.Regression).

    Prior: Sigma ~ IW(nu_0, S_0); A | Sigma ~ MN(M_0, Sigma, K_0^{-1}).
    """

    def __init__(self, D_out: int, D_in: int, affine: bool = True,
                 M_0=None, K_0=None, nu_0=None, S_0=None, seed: int = 0):
        self.D_out, self.D_in, self.affine = D_out, D_in, affine
        P = D_in + (1 if affine else 0)
        self.M_0 = (np.zeros((D_out, P), np.float32) if M_0 is None
                    else np.asarray(M_0, np.float32))
        self.K_0 = (np.eye(P, dtype=np.float32) if K_0 is None
                    else np.asarray(K_0, np.float32))
        self.nu_0 = float(nu_0 if nu_0 is not None else D_out + 2)
        self.S_0 = (np.eye(D_out, dtype=np.float32) if S_0 is None
                    else np.asarray(S_0, np.float32))
        self._key = jax.random.key(seed)
        self.A = self.M_0.copy()
        self.sigma = self.S_0 / max(self.nu_0 - D_out - 1, 1.0)
        self.resample([])   # prior draw

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def _pad(self, X):
        X = np.atleast_2d(np.asarray(X, np.float32))
        if self.affine:
            X = np.concatenate([X, np.ones((X.shape[0], 1), np.float32)], 1)
        return X

    def resample(self, data=None):
        """data: (X, Y) tuple or list of tuples."""
        if data is None:
            data = []
        if isinstance(data, tuple):
            data = [data]
        P = self.M_0.shape[1]
        Sxx = jnp.asarray(self.K_0)
        Syx = jnp.asarray(self.M_0 @ self.K_0)
        Syy = jnp.asarray(self.S_0 + self.M_0 @ self.K_0 @ self.M_0.T)
        n = self.nu_0
        for X, Y in data:
            Xp = jnp.asarray(self._pad(X))
            Yp = jnp.asarray(np.atleast_2d(np.asarray(Y, np.float32)))
            Sxx = Sxx + Xp.T @ Xp
            Syx = Syx + Yp.T @ Xp
            Syy = Syy + Yp.T @ Yp
            n += Xp.shape[0]
        # MNIW posterior: M_n = Syx Sxx^{-1}; S_n = Syy - M_n Syx'
        Sxx = 0.5 * (Sxx + Sxx.T) + 1e-6 * jnp.eye(P)
        M_n = jnp.linalg.solve(Sxx, Syx.T).T
        S_n = Syy - M_n @ Syx.T
        S_n = 0.5 * (S_n + S_n.T) + 1e-6 * jnp.eye(self.D_out)
        k1, k2 = jax.random.split(self._next_key())
        sigma = sample_invwishart(k1, jnp.asarray(n, jnp.float32), S_n)
        # A | Sigma ~ MN(M_n, Sigma, Sxx^{-1}):
        # A = M_n + chol(Sigma) E chol(Sxx)^{-T},  E ~ iid N(0,1)
        Cs = jnp.linalg.cholesky(sigma)
        Cx = jnp.linalg.cholesky(Sxx)
        E = jax.random.normal(k2, (self.D_out, P))
        A = M_n + Cs @ jax.scipy.linalg.solve_triangular(
            Cx, E.T, lower=True, trans=1).T
        self.A, self.sigma = np.asarray(A), np.asarray(sigma)
        return self

    def log_likelihood(self, data):
        X, Y = data
        Xp = self._pad(X)
        Y = np.atleast_2d(np.asarray(Y, np.float32))
        resid = Y - Xp @ self.A.T
        C = np.linalg.cholesky(self.sigma)
        z = np.linalg.solve(C, resid.T)
        logdet = 2 * np.sum(np.log(np.diag(C)))
        return (-0.5 * np.sum(z * z, axis=0)
                - 0.5 * (logdet + self.D_out * np.log(2 * np.pi)))

    def rvs(self, X):
        Xp = self._pad(X)
        mean = Xp @ self.A.T
        C = np.linalg.cholesky(self.sigma)
        eps = np.asarray(jax.random.normal(self._next_key(), mean.shape))
        return mean + eps @ C.T
