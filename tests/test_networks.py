"""Network-prior conditionals against brute-force enumeration.

The SBM label Gibbs move is the one network conditional with nontrivial
bookkeeping (self-edge handled once, with the candidate label on both ends
— reference: pyglm/networks.py SBM label sweep). Here the scan's first
label draw is compared against the exact enumerated conditional.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pyglm_tpu.models.networks import SBMConfig, SBMState


def _exact_label_conditional(state, A, W, n):
    """Exact p(c_n = x | c_{-n}, A, W, pi, rho, mu, Sigma) by enumeration
    (independent NumPy implementation of the SBM edge likelihoods)."""
    c = np.asarray(state.c)
    pi = np.asarray(state.pi)
    rho = np.clip(np.asarray(state.rho), 1e-5, 1 - 1e-5)
    mu = np.asarray(state.mu)            # (K, K, B)
    Sigma = np.asarray(state.Sigma)      # (K, K, B, B)
    A = np.asarray(A)
    W = np.asarray(W)
    K = pi.shape[0]
    N = A.shape[0]
    B = W.shape[-1]

    def log_bern(a, r):
        return a * np.log(r) + (1 - a) * np.log1p(-r)

    def log_norm(w, m, S):
        d = w - m
        q = d @ np.linalg.solve(S, d)
        _, ld = np.linalg.slogdet(S)
        return -0.5 * (q + ld + B * np.log(2 * np.pi))

    logp = np.log(pi + 1e-12).copy()
    for x in range(K):
        for m in range(N):
            if m == n:
                # self-edge: candidate label on both ends
                logp[x] += log_bern(A[n, n], rho[x, x])
                if A[n, n]:
                    logp[x] += log_norm(W[n, n], mu[x, x], Sigma[x, x])
                continue
            cm = c[m]
            logp[x] += log_bern(A[n, m], rho[x, cm])
            if A[n, m]:
                logp[x] += log_norm(W[n, m], mu[x, cm], Sigma[x, cm])
            logp[x] += log_bern(A[m, n], rho[cm, x])
            if A[m, n]:
                logp[x] += log_norm(W[m, n], mu[cm, x], Sigma[cm, x])
    logp -= logp.max()
    p = np.exp(logp)
    return p / p.sum()


def test_sbm_label_conditional_matches_enumeration():
    """The first label draw of the resample scan conditions on the initial
    labels of all other neurons, so its distribution over many keys must
    match the enumerated conditional (this catches the self-edge bug where
    A_nn was scored with the old label on the postsynaptic end)."""
    N, K, B = 4, 2, 1
    cfg = SBMConfig(N=N, B=B, K=K)
    state = SBMState(
        c=jnp.asarray([0, 1, 0, 1], jnp.int32),
        pi=jnp.asarray([0.5, 0.5], jnp.float32),
        rho=jnp.asarray([[0.9, 0.15], [0.25, 0.8]], jnp.float32),
        mu=jnp.asarray([[[1.5], [-1.0]], [[-0.5], [2.0]]], jnp.float32),
        Sigma=jnp.broadcast_to(
            jnp.eye(B) * 0.25, (K, K, B, B)).astype(jnp.float32),
    )
    rng = np.random.RandomState(0)
    A = jnp.asarray((rng.rand(N, N) < 0.6).astype(np.float32))
    A = A.at[0, 0].set(1.0)       # make the self-edge weight term active
    W = jnp.asarray(rng.randn(N, N, B).astype(np.float32) * 0.8)
    W = W * A[:, :, None]

    p_exact = _exact_label_conditional(state, A, W, n=0)

    M = 4000
    keys = jax.random.split(jax.random.key(42), M)
    draw_c0 = jax.jit(jax.vmap(
        lambda k: cfg.resample(k, state, A, W).c[0]))
    c0 = np.asarray(draw_c0(keys))
    freq = np.bincount(c0, minlength=K) / M
    se = np.sqrt(p_exact * (1 - p_exact) / M)
    for x in range(K):
        assert abs(freq[x] - p_exact[x]) < 4 * se[x] + 1e-3, (
            x, freq, p_exact)


def test_sbm_label_conditional_three_blocks():
    """Same check at K=3 with an asymmetric state (exercises the in/out
    table transposes for off-diagonal block pairs)."""
    N, K, B = 5, 3, 2
    cfg = SBMConfig(N=N, B=B, K=K)
    rng = np.random.RandomState(1)
    rho = np.clip(rng.rand(K, K) * 0.8 + 0.1, 0.1, 0.9)
    mu = rng.randn(K, K, B) * 1.2
    state = SBMState(
        c=jnp.asarray(rng.randint(0, K, N), jnp.int32),
        pi=jnp.asarray(np.full(K, 1.0 / K), jnp.float32),
        rho=jnp.asarray(rho, jnp.float32),
        mu=jnp.asarray(mu, jnp.float32),
        Sigma=jnp.broadcast_to(
            jnp.eye(B) * 0.3, (K, K, B, B)).astype(jnp.float32),
    )
    A = jnp.asarray((rng.rand(N, N) < 0.5).astype(np.float32))
    A = A.at[0, 0].set(1.0)
    W = jnp.asarray(rng.randn(N, N, B).astype(np.float32))
    W = W * A[:, :, None]

    p_exact = _exact_label_conditional(state, A, W, n=0)
    M = 4000
    keys = jax.random.split(jax.random.key(7), M)
    c0 = np.asarray(jax.jit(jax.vmap(
        lambda k: cfg.resample(k, state, A, W).c[0]))(keys))
    freq = np.bincount(c0, minlength=K) / M
    se = np.sqrt(p_exact * (1 - p_exact) / M)
    np.testing.assert_array_less(
        np.abs(freq - p_exact), 4 * se + 1e-3, err_msg=f"{freq} {p_exact}")
