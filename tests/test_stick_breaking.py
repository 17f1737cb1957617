import numpy as np
import jax.numpy as jnp

from pyglm_tpu.ops.stick_breaking import (
    psi_to_pi, pi_to_psi, N_vec, kappa_vec, compute_psi_cmoments,
)


def test_psi_pi_roundtrip():
    rng = np.random.RandomState(0)
    psi = jnp.asarray(rng.randn(50, 4), jnp.float32)
    pi = psi_to_pi(psi)
    assert pi.shape == (50, 5)
    np.testing.assert_allclose(np.asarray(pi).sum(-1), 1.0, atol=1e-5)
    assert np.all(np.asarray(pi) >= 0)
    psi2 = pi_to_psi(pi)
    np.testing.assert_allclose(np.asarray(psi2), np.asarray(psi),
                               rtol=1e-3, atol=1e-3)


def test_n_kappa_vec():
    y = jnp.asarray([[3.0, 2.0, 1.0, 4.0]])
    N = np.asarray(N_vec(y))
    np.testing.assert_allclose(N, [[10.0, 7.0, 5.0]])
    k = np.asarray(kappa_vec(y))
    np.testing.assert_allclose(k, [[3 - 5.0, 2 - 3.5, 1 - 2.5]])


def test_psi_cmoments_shapes():
    m, v = compute_psi_cmoments(np.ones(4))
    assert m.shape == (3,) and v.shape == (3,)
    assert np.all(v > 0)
    # Dirichlet(1,1,1,1): pi_1 ~ Beta(1,3), E[logit(pi_1)] = digamma(1) -
    # digamma(3) = -1.5 exactly.
    assert abs(m[0] + 1.5) < 0.1, m
