import numpy as np
import jax.numpy as jnp

from pyglm_tpu.ops.basis import cosine_basis, convolve_with_basis, design_matrix


def _convolve_reference(Y, basis):
    """Trusted O(T*L) numpy oracle for the causal basis convolution:
    X[t,n,b] = sum_{d=1..L} Y[t-d,n] * basis[d-1,b]."""
    T, N = Y.shape
    L, B = basis.shape
    X = np.zeros((T, N, B))
    for t in range(T):
        for d in range(1, L + 1):
            if t - d >= 0:
                X[t] += Y[t - d][:, None] * basis[d - 1][None, :]
    return X


def test_cosine_basis_shape_and_norm():
    basis = cosine_basis(B=4, L=12)
    assert basis.shape == (12, 4)
    assert np.all(basis >= 0)
    np.testing.assert_allclose(basis.sum(axis=0), 1.0, rtol=1e-5)


def test_cosine_basis_orth():
    basis = cosine_basis(B=4, L=20, orth=True)
    gram = basis.T @ basis
    np.testing.assert_allclose(gram, np.eye(4), atol=1e-5)


def test_cosine_basis_single_filter():
    basis = cosine_basis(B=1, L=8)
    assert basis.shape == (8, 1)
    assert basis.sum() > 0


def test_convolve_matches_reference():
    rng = np.random.RandomState(0)
    Y = rng.binomial(1, 0.3, size=(50, 3)).astype(np.float32)
    basis = cosine_basis(B=4, L=7)
    X = np.asarray(convolve_with_basis(jnp.asarray(Y), basis))
    X_ref = _convolve_reference(Y, basis)
    np.testing.assert_allclose(X, X_ref, atol=1e-5)


def test_convolve_causality():
    # A single spike at time t0 must influence only rows t0+1 .. t0+L.
    T, N, L, B = 30, 2, 5, 3
    Y = np.zeros((T, N), np.float32)
    t0 = 10
    Y[t0, 1] = 1.0
    basis = cosine_basis(B=B, L=L)
    X = np.asarray(convolve_with_basis(jnp.asarray(Y), basis))
    assert np.all(X[: t0 + 1] == 0)
    assert np.all(X[t0 + 1:, 0] == 0)
    np.testing.assert_allclose(X[t0 + 1: t0 + 1 + L, 1], basis, atol=1e-6)
    assert np.all(X[t0 + 1 + L:] == 0)


def test_design_matrix_layout():
    rng = np.random.RandomState(1)
    Y = rng.binomial(1, 0.5, size=(40, 3)).astype(np.float32)
    basis = cosine_basis(B=2, L=4)
    Xf = np.asarray(design_matrix(jnp.asarray(Y), basis))
    assert Xf.shape == (40, 3 * 2 + 1)
    np.testing.assert_allclose(Xf[:, -1], 1.0)
    X = np.asarray(convolve_with_basis(jnp.asarray(Y), basis))
    np.testing.assert_allclose(Xf[:, :-1], X.reshape(40, 6), atol=1e-6)
