"""Trusted single-process NumPy re-implementation of the Gibbs sweep.

Purpose (SURVEY.md §7 hard-part #5):
1. an independent oracle for cross-checking the TPU implementation's math
   (same conditionals, different code path, f64);
2. the CPU-baseline denominator for bench.py — it mirrors the *reference's*
   architecture (per-neuron Python loop over regressions, per-edge sequential
   spike-and-slab, BLAS for X' Omega X, vectorized rejection sampling for the
   PG draws) without copying its code, standing in for CPU pyglm which is
   unbuildable here (reference mount empty; see SURVEY.md provenance note).

Covers the headline config: Bernoulli observations, Erdős–Rényi
spike-and-slab. Deliberately f64 NumPy, like the reference.
"""
from __future__ import annotations

import numpy as np

_T = 0.64


def _coef(x, n):
    """Devroye alternating-series coefficients a_n(x) (piecewise)."""
    half = n + 0.5
    out = np.where(
        x <= _T,
        np.pi * half * (2.0 / (np.pi * np.maximum(x, 1e-300))) ** 1.5
        * np.exp(-2.0 * half * half / np.maximum(x, 1e-300)),
        np.pi * half * np.exp(-half * half * np.pi ** 2 * x / 2.0),
    )
    return out


def _trunc_inv_gauss(rng, z):
    """X ~ IG(1/z, 1) | X < t, vectorized rejection (PSW 2013)."""
    n = z.shape[0]
    X = np.empty(n)
    todo = np.ones(n, bool)
    while todo.any():
        idx = np.flatnonzero(todo)
        zz = z[idx]
        useA = zz * _T < 1.0
        E1 = rng.exponential(size=idx.size)
        E2 = rng.exponential(size=idx.size)
        okA = E1 ** 2 <= 2 * E2 / _T
        XA = _T / (1 + _T * E1) ** 2
        accA = useA & okA & (rng.rand(idx.size) <= np.exp(-0.5 * zz ** 2 * XA))
        mu = 1.0 / np.maximum(zz, 1e-300)
        Yn = rng.randn(idx.size) ** 2
        muY = mu * Yn
        XB = mu + 0.5 * mu * muY - 0.5 * mu * np.sqrt(4 * muY + muY ** 2)
        XB = np.where(rng.rand(idx.size) <= mu / (mu + XB), XB,
                      mu ** 2 / np.maximum(XB, 1e-300))
        accB = (~useA) & (XB <= _T)
        acc = accA | accB
        X[idx[acc]] = np.where(accA, XA, XB)[acc]
        todo[idx[acc]] = False
    return X


def numpy_pg_devroye(rng, c):
    """Exact PG(1, c) draws, vectorized NumPy (independent of the JAX path)."""
    c = np.asarray(c, np.float64)
    z = 0.5 * np.abs(c).ravel()
    n = z.size
    X = np.empty(n)
    todo = np.ones(n, bool)
    K = np.pi ** 2 / 8 + z ** 2 / 2
    from scipy.stats import norm
    sq = np.sqrt(_T)
    logq = np.log(2.0) + np.logaddexp(
        -z + norm.logcdf((z * _T - 1) / sq),
        z + norm.logcdf(-(z * _T + 1) / sq))
    logp = np.log(np.pi / (2 * K)) - K * _T
    p_ratio = np.exp(logp - np.logaddexp(logp, logq))
    while todo.any():
        idx = np.flatnonzero(todo)
        m = idx.size
        use_exp = rng.rand(m) < p_ratio[idx]
        Xp = np.where(use_exp,
                      _T + rng.exponential(size=m) / K[idx],
                      _trunc_inv_gauss(rng, z[idx]))
        # series accept
        S = _coef(Xp, 0)
        Y = rng.rand(m) * S
        acc = np.zeros(m, bool)
        done = np.zeros(m, bool)
        for nn in range(1, 12):
            term = _coef(Xp, nn)
            if nn % 2 == 1:
                S = S - term
                newacc = (~done) & (Y <= S)
                acc |= newacc
                done |= newacc
            else:
                S = S + term
                done |= Y > S
        X[idx[acc]] = Xp[acc]
        todo[idx[acc]] = False
    return (X / 4.0).reshape(np.shape(c))


class NumpyGLMReference:
    """Bernoulli spike-and-slab network GLM, architecture-faithful to the
    reference: resample() loops neurons in Python, forms per-neuron
    sufficient stats with BLAS, and runs the sequential per-edge collapsed
    spike-and-slab update (pyglm/regressions.py _resample_A_W analog)."""

    def __init__(self, N, B, basis, rho=0.2, mu_w=0.0, sigma_w=1.0,
                 mu_b=-2.0, sigma_b=1.0, seed=0):
        self.N, self.B = N, B
        self.basis = np.asarray(basis, np.float64)
        self.rho, self.mu_w, self.sigma_w = rho, mu_w, sigma_w
        self.mu_b, self.sigma_b = mu_b, sigma_b
        self.rng = np.random.RandomState(seed)
        self.A = (self.rng.rand(N, N) < rho).astype(np.float64)
        self.W = self.rng.randn(N, N, B) * np.sqrt(sigma_w) * self.A[:, :, None]
        self.b = mu_b + np.sqrt(sigma_b) * self.rng.randn(N)

    def design(self, Y):
        T, N = Y.shape
        L, B = self.basis.shape
        X = np.zeros((T, N, B))
        for d in range(1, L + 1):
            X[d:] += Y[:-d][:, :, None] * self.basis[d - 1][None, None, :]
        Xf = X.reshape(T, N * B)
        return np.concatenate([Xf, np.ones((T, 1))], axis=1)

    def resample(self, Y, Xf):
        """One Gibbs sweep (weights + adjacency; fixed hyperparameters)."""
        N, B = self.N, self.B
        P = N * B + 1
        w_full = np.concatenate(
            [(self.A[:, :, None] * self.W).transpose(0, 2, 1).reshape(N * B, N),
             self.b[None, :]], axis=0)
        kappa = Y - 0.5
        Lam0 = np.eye(B) / self.sigma_w
        mu0 = np.full(B, self.mu_w)
        logit_rho = np.log(self.rho / (1 - self.rho))
        ld0 = 0.5 * np.linalg.slogdet(Lam0)[1]
        for n in range(N):                       # per-neuron loop (reference style)
            psi = Xf @ w_full[:, n]
            omega = numpy_pg_devroye(self.rng, psi)
            J = (Xf * omega[:, None]).T @ Xf     # (P, P)
            h = Xf.T @ kappa[:, n]
            w = w_full[:, n].copy()
            r = J @ w
            for j in range(N):                   # sequential spike-and-slab
                sl = slice(j * B, (j + 1) * B)
                Jjj = J[sl, sl]
                mj = h[sl] - (r[sl] - Jjj @ w[sl])
                Lp = Lam0 + Jjj
                bpost = mj + Lam0 @ mu0
                mup = np.linalg.solve(Lp, bpost)
                log_ev = (0.5 * mup @ bpost - 0.5 * mu0 @ (Lam0 @ mu0)
                          + ld0 - 0.5 * np.linalg.slogdet(Lp)[1])
                p1 = 1.0 / (1.0 + np.exp(-(logit_rho + log_ev)))
                a = self.rng.rand() < p1
                wj_new = np.zeros(B)
                if a:
                    cov = np.linalg.inv(Lp)
                    wj_new = self.rng.multivariate_normal(mup, cov)
                r += J[:, sl] @ (wj_new - w[sl])
                w[sl] = wj_new
                self.A[j, n] = float(a)
                self.W[j, n] = wj_new
            # bias
            m = h[-1] - (r[-1] - J[-1, -1] * w[-1]) + self.mu_b / self.sigma_b
            lamp = 1.0 / self.sigma_b + J[-1, -1]
            bn = m / lamp + self.rng.randn() / np.sqrt(lamp)
            w[-1] = bn
            self.b[n] = bn
            w_full[:, n] = w

    def log_likelihood(self, Y, Xf):
        N, B = self.N, self.B
        w_full = np.concatenate(
            [(self.A[:, :, None] * self.W).transpose(0, 2, 1).reshape(N * B, N),
             self.b[None, :]], axis=0)
        psi = Xf @ w_full
        return float(np.sum(Y * psi - np.logaddexp(0.0, psi)))
