"""Stick-breaking transforms for PG-augmented multinomial models.

Capability parity with ``pypolyagamma/utils.py`` (``psi_to_pi``,
``pi_to_psi``, ``N_vec``, ``kappa_vec``, ``compute_psi_cmoments``): a
K-dimensional categorical is represented as K-1 dependent binomial
subproblems via the stick-breaking logistic map, each of which admits the
standard PG augmentation.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from pyglm_tpu.utils.utils import logistic, logit


def psi_to_pi(psi):
    """(..., K-1) stick-breaking logits -> (..., K) simplex probabilities.

    pi_k = sigma(psi_k) * prod_{j<k}(1 - sigma(psi_j)); pi_K = remainder.
    """
    psi = jnp.asarray(psi)
    sig = logistic(psi)
    # cumulative product of remaining stick, exclusive
    log_rem = jnp.cumsum(jnp.log1p(-sig), axis=-1)
    log_rem_excl = jnp.concatenate(
        [jnp.zeros_like(log_rem[..., :1]), log_rem[..., :-1]], axis=-1)
    pi_head = sig * jnp.exp(log_rem_excl)
    pi_last = jnp.exp(log_rem[..., -1:])
    return jnp.concatenate([pi_head, pi_last], axis=-1)


def pi_to_psi(pi):
    """Inverse of psi_to_pi: (..., K) simplex -> (..., K-1) logits."""
    pi = jnp.asarray(pi)
    K = pi.shape[-1]
    cum = jnp.cumsum(pi, axis=-1)
    rem = 1.0 - jnp.concatenate(
        [jnp.zeros_like(cum[..., :1]), cum[..., :-2]], axis=-1)
    frac = pi[..., :-1] / jnp.maximum(rem, 1e-12)
    return logit(jnp.clip(frac, 1e-12, 1.0 - 1e-12))


def N_vec(y):
    """PG 'trial count' vector for multinomial counts y (..., K):
    N_k = N_total - sum_{j<k} y_j, for k = 1..K-1 (reference: N_vec)."""
    y = jnp.asarray(y)
    total = jnp.sum(y, axis=-1, keepdims=True)
    cum = jnp.cumsum(y, axis=-1)
    cum_excl = jnp.concatenate(
        [jnp.zeros_like(cum[..., :1]), cum[..., :-1]], axis=-1)
    return (total - cum_excl)[..., :-1]


def kappa_vec(y):
    """PG 'kappa' vector: kappa_k = y_k - N_k / 2 (reference: kappa_vec)."""
    y = jnp.asarray(y)
    return y[..., :-1] - 0.5 * N_vec(y)


def compute_psi_cmoments(alphas):
    """Mean/variance of psi_k implied by a Dirichlet(alphas) prior on pi,
    by Monte Carlo (matches the reference utility's role: setting Gaussian
    prior moments for stick-breaking logits)."""
    import numpy as np
    alphas = np.asarray(alphas, float)
    K = alphas.shape[-1]
    rng = np.random.RandomState(0)
    pis = rng.dirichlet(alphas, size=20_000)
    psis = np.asarray(pi_to_psi(jnp.asarray(pis)))
    return psis.mean(0), psis.var(0)
