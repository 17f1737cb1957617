"""Cross-check the two spike-and-slab implementations.

`resample_spike_slab` (direct Gram-stack, reference-shaped algebra) and
`resample_spike_slab_tspace` (residual-space, grouped) must define the SAME
conditional law for (A, w) given (omega, kappa). They consume randomness
differently, so the check is distributional: repeated draws from a fixed
conditional must agree in their edge-acceptance probabilities and weight
means.
"""
import numpy as np
import jax
import jax.numpy as jnp

from pyglm_tpu.models.weights import (
    EdgeHypers, sufficient_stats, resample_spike_slab,
    resample_spike_slab_tspace, pack_weights,
)

N, B, T = 4, 2, 600
P = N * B + 1
N_REPS = 400


def _setup():
    rng = np.random.RandomState(0)
    Xf = jnp.asarray(
        (rng.rand(T, P) * (rng.rand(T, P) < 0.4)).astype(np.float32))
    Xf = Xf.at[:, -1].set(1.0)
    omega = jnp.asarray(rng.rand(T, N).astype(np.float32) * 0.3 + 0.05)
    kappa = jnp.asarray(((rng.rand(T, N) < 0.2) - 0.5).astype(np.float32))
    w0 = jnp.asarray(rng.randn(P, N).astype(np.float32) * 0.1)
    hyp = EdgeHypers(
        mu=jnp.zeros((N, N, B)),
        Lam=jnp.broadcast_to(jnp.eye(B) * 2.0, (N, N, B, B)),
        logit_rho=jnp.full((N, N), -0.5),
        mu_b=jnp.full((N,), -1.0),
        lam_b=jnp.full((N,), 4.0))
    return Xf, omega, kappa, w0, hyp


def test_gram_and_tspace_paths_same_conditional():
    Xf, omega, kappa, w0, hyp = _setup()
    J, h = sufficient_stats(Xf, omega, kappa, t_chunk=128)

    @jax.jit
    def draw_gram(k):
        return resample_spike_slab(k, J, h, w0, hyp, B)

    @jax.jit
    def draw_tspace(k):
        A, w, _, _ = resample_spike_slab_tspace(
            k, Xf, omega, kappa, w0, hyp, B, t_chunk=128, group=2)
        return A, w

    keys = jax.random.split(jax.random.key(1), N_REPS)
    A1, W1 = jax.vmap(draw_gram)(keys)
    keys2 = jax.random.split(jax.random.key(2), N_REPS)
    A2, W2 = jax.vmap(draw_tspace)(keys2)

    pA1, pA2 = np.asarray(A1.mean(0)), np.asarray(A2.mean(0))
    se = np.sqrt(np.maximum(pA1 * (1 - pA1), 0.05) / N_REPS)
    assert np.all(np.abs(pA1 - pA2) < 6 * se + 0.02), (
        np.abs(pA1 - pA2).max())

    mW1, mW2 = np.asarray(W1.mean(0)), np.asarray(W2.mean(0))
    sd = np.asarray(W1.std(0)) + 1e-3
    assert np.all(np.abs(mW1 - mW2) < 6 * sd / np.sqrt(N_REPS) + 0.02), (
        np.abs(mW1 - mW2).max())
