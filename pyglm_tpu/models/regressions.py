"""Standalone PG-augmented logistic regressions.

Capability parity with ``pypolyagamma/distributions.py``
(``_PGLogisticRegressionBase``, ``BernoulliRegression``,
``BinomialRegression``, ``NegativeBinomialRegression``,
``MultinomialRegression``): Bayesian GLMs y ~ f(psi), psi = A x + b, with
Gaussian priors on (A, b) and exact Gibbs via Polya-gamma auxiliaries.
Unlike the network model (models/glm.py) these regress on arbitrary
covariates; the multinomial uses the stick-breaking construction
(ops/stick_breaking.py).

All D_out output dimensions update in one batched Cholesky solve per
resample (the reference loops them in Python).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln

from pyglm_tpu.ops.polyagamma import polya_gamma, pg_draw_unit
from pyglm_tpu.ops.linalg import sample_mvn_info, crt_sample
from pyglm_tpu.ops.stick_breaking import psi_to_pi, N_vec, kappa_vec
from pyglm_tpu.utils.utils import logistic, softplus


def _resample_weights(key, X, kappa, omega, mu_prior, lam_prior):
    """Batched conjugate draw for all output dims.

    X: (T, D_in); kappa, omega: (T, D_out); prior mean/precision for rows of
    [A | b]: (D_out, D_in+1). Returns (D_out, D_in+1).
    """
    T = X.shape[0]
    Xb = jnp.concatenate([X, jnp.ones((T, 1), X.dtype)], axis=1)  # (T, P)

    def one(kd, kap, om, mu0, lam0):
        J = (Xb * om[:, None]).T @ Xb + jnp.diag(lam0)
        h = Xb.T @ kap + lam0 * mu0
        return sample_mvn_info(kd, h, J)

    keys = jax.random.split(key, kappa.shape[1])
    return jax.vmap(one, in_axes=(0, 1, 1, 0, 0))(
        keys, kappa, omega, mu_prior, lam_prior)


class _PGLogisticRegressionBase:
    """psi = A x + b; subclasses define (pg_b, kappa, log_likelihood, rvs)."""

    def __init__(self, D_out: int, D_in: int, mu_A=0.0, sigmasq_A=1.0,
                 mu_b=0.0, sigmasq_b=1.0, seed: int = 0):
        self.D_out, self.D_in = D_out, D_in
        P = D_in + 1
        self._mu = np.full((D_out, P), mu_A, np.float32)
        self._mu[:, -1] = mu_b
        self._lam = np.full((D_out, P), 1.0 / sigmasq_A, np.float32)
        self._lam[:, -1] = 1.0 / sigmasq_b
        self._key = jax.random.key(seed)
        k = self._next_key()
        w = self._mu + jax.random.normal(k, (D_out, P)) / np.sqrt(self._lam)
        # np.array (copy): jax->numpy views are read-only, but the reference
        # API exposes mutable .A/.b attributes.
        self.A = np.array(w[:, :-1])
        self.b = np.array(w[:, -1])

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def psi(self, X):
        return jnp.asarray(X) @ jnp.asarray(self.A).T + jnp.asarray(self.b)

    # -- subclass hooks ------------------------------------------------
    def pg_b(self, y):
        raise NotImplementedError

    def kappa(self, y):
        raise NotImplementedError

    def resample(self, datas):
        """One Gibbs sweep of (A, b) given [(X, y), ...]."""
        if not isinstance(datas, list):
            datas = [datas]
        X = jnp.concatenate([jnp.asarray(d[0], jnp.float32) for d in datas])
        y = jnp.concatenate([jnp.asarray(d[1], jnp.float32) for d in datas])
        psi = self.psi(X)
        b_pg = self.pg_b(y)
        omega = polya_gamma(self._next_key(), b_pg, psi)
        w = _resample_weights(
            self._next_key(), X, self.kappa(y), omega,
            jnp.asarray(self._mu), jnp.asarray(self._lam))
        self.A = np.asarray(w[:, :-1])
        self.b = np.asarray(w[:, -1])
        self._resample_aux(y, self.psi(X))

    def _resample_aux(self, y, psi):
        pass

    def log_likelihood(self, data):
        X, y = data
        psi = self.psi(jnp.asarray(X, jnp.float32))
        return np.asarray(self._ll(jnp.asarray(y, jnp.float32), psi))

    def _ll(self, y, psi):
        raise NotImplementedError

    def rvs(self, X):
        raise NotImplementedError


class BernoulliRegression(_PGLogisticRegressionBase):
    def __init__(self, D_out, D_in, **kw):
        super().__init__(D_out, D_in, **kw)

    def pg_b(self, y):
        return jnp.ones_like(y)

    def kappa(self, y):
        return y - 0.5

    def _ll(self, y, psi):
        return jnp.sum(y * psi - softplus(psi), axis=-1)

    def rvs(self, X):
        p = logistic(self.psi(jnp.asarray(X, jnp.float32)))
        return np.asarray(
            jax.random.bernoulli(self._next_key(), p), np.float32)


class BinomialRegression(_PGLogisticRegressionBase):
    def __init__(self, N: int, D_out, D_in, **kw):
        self.N = N
        super().__init__(D_out, D_in, **kw)

    def pg_b(self, y):
        return jnp.full_like(y, float(self.N))

    def kappa(self, y):
        return y - 0.5 * self.N

    def _ll(self, y, psi):
        n = float(self.N)
        logC = gammaln(n + 1) - gammaln(y + 1) - gammaln(n - y + 1)
        return jnp.sum(logC + y * psi - n * softplus(psi), axis=-1)

    def rvs(self, X):
        p = logistic(self.psi(jnp.asarray(X, jnp.float32)))
        return np.asarray(jax.random.binomial(
            self._next_key(), float(self.N), p), np.float32)


class NegativeBinomialRegression(_PGLogisticRegressionBase):
    def __init__(self, D_out, D_in, r=4.0, a_r=2.0, b_r=0.5, max_y=256,
                 resample_r=True, **kw):
        self.r = np.full(D_out, float(r), np.float32)
        self.a_r, self.b_r, self.max_y = a_r, b_r, int(max_y)
        self._do_r = resample_r
        super().__init__(D_out, D_in, **kw)

    def pg_b(self, y):
        return y + jnp.asarray(self.r)

    def kappa(self, y):
        return 0.5 * (y - jnp.asarray(self.r))

    def _ll(self, y, psi):
        r = jnp.asarray(self.r)
        logC = gammaln(y + r) - gammaln(r) - gammaln(y + 1)
        return jnp.sum(logC + y * psi - (y + r) * softplus(psi), axis=-1)

    def _resample_aux(self, y, psi):
        if not self._do_r:
            return
        k1, k2 = jax.random.split(self._next_key())
        l = crt_sample(k1, y.astype(jnp.int32), jnp.asarray(self.r)[None, :],
                       self.max_y)
        shape = self.a_r + jnp.sum(l, axis=0).astype(jnp.float32)
        rate = self.b_r + jnp.sum(softplus(psi), axis=0)
        self.r = np.maximum(
            np.asarray(jax.random.gamma(k2, shape) / rate), 1e-3)

    def rvs(self, X):
        k1, k2 = jax.random.split(self._next_key())
        psi = self.psi(jnp.asarray(X, jnp.float32))
        lam = jax.random.gamma(
            k1, jnp.broadcast_to(jnp.asarray(self.r), psi.shape)) * jnp.exp(psi)
        return np.asarray(jax.random.poisson(
            k2, jnp.minimum(lam, 1e6)), np.float32)


class MultinomialRegression(_PGLogisticRegressionBase):
    """K-way categorical counts via stick-breaking PG augmentation
    (reference: pypolyagamma/distributions.py MultinomialRegression).
    y: (T, K) counts; psi has K-1 stick dimensions."""

    def __init__(self, K: int, D_in, **kw):
        self.K = K
        super().__init__(K - 1, D_in, **kw)

    def pg_b(self, y):
        return N_vec(y)

    def kappa(self, y):
        return kappa_vec(y)

    def pi(self, X):
        return psi_to_pi(self.psi(jnp.asarray(X, jnp.float32)))

    def _ll(self, y, psi):
        pi = psi_to_pi(psi)
        total = jnp.sum(y, axis=-1)
        logC = (gammaln(total + 1) - jnp.sum(gammaln(y + 1), axis=-1))
        return logC + jnp.sum(y * jnp.log(jnp.maximum(pi, 1e-12)), axis=-1)

    def rvs(self, X, n_trials: int = 1):
        pi = self.pi(X)
        draws = jax.random.categorical(
            self._next_key(), jnp.log(jnp.maximum(pi, 1e-12)),
            shape=(n_trials,) + pi.shape[:-1])
        onehot = jax.nn.one_hot(draws, self.K)
        return np.asarray(jnp.sum(onehot, axis=0), np.float32)
