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


@pytest.mark.slow
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


# ---------------------------------------------------------------------------
# Per-edge hyperparameter injection (VERDICT r1 #7): scalar-or-array
# (rho, mu_w, sigma_w, bias hypers) accepted by the network configs.
# ---------------------------------------------------------------------------

from pyglm_tpu.models.networks import ErdosRenyiConfig, DenseNetworkConfig
from pyglm_tpu.models.observations import Bernoulli
from pyglm_tpu.models.sweep import init_state_from_prior
from pyglm_tpu.utils.utils import logit


def test_per_edge_rho_injection():
    """A planted (N, N) rho matrix must reach EdgeHypers and drive both the
    prior draw of A and the spike-and-slab conditional."""
    N, B = 6, 1
    R = np.full((N, N), 0.05, np.float32)
    R[:3, :3] = 0.9
    cfg = ErdosRenyiConfig(N=N, B=B, rho_init=R, learn_rho=False,
                           learn_weight_prior=False, sigma_w=0.5)
    state = cfg.init_state(jax.random.key(0))
    lrho = np.asarray(cfg.edge_hypers(state).logit_rho)
    np.testing.assert_allclose(lrho, np.asarray(logit(jnp.asarray(R))),
                               rtol=1e-5)
    # prior draws follow the per-edge probabilities
    obs = Bernoulli()
    draw = jax.jit(jax.vmap(lambda k: init_state_from_prior(
        k, obs, cfg, N, B, True).A))
    A = np.asarray(draw(jax.random.split(jax.random.key(1), 800)))
    freq = A.mean(axis=0)
    assert abs(freq[:3, :3].mean() - 0.9) < 0.05, freq[:3, :3].mean()
    assert abs(freq[3:, 3:].mean() - 0.05) < 0.03, freq[3:, 3:].mean()


@pytest.mark.slow
def test_per_edge_rho_through_model_posterior():
    """End-to-end: with weak data, the posterior edge marginals follow the
    planted per-edge prior — verifies logit_rho threads into the collapsed
    spike-and-slab odds."""
    import pyglm_tpu as pt
    N, B = 6, 1
    R = np.full((N, N), 0.02, np.float32)
    R[:3, :3] = 0.95
    m = pt.GLM(N, B=B, L=3, observation="bernoulli", network="erdos_renyi",
               spike_and_slab=True, seed=0,
               net_kwargs=dict(rho_init=R, learn_rho=False,
                               learn_weight_prior=False, sigma_w=0.25))
    Y = (np.random.RandomState(0).rand(40, N) < 0.2).astype(np.float32)
    m.add_data(Y)
    s = m.fit_compiled(n_samples=300, n_burnin=50)
    freq = s["A"].mean(axis=0)
    assert freq[:3, :3].mean() > 0.75, freq[:3, :3].mean()
    assert freq[3:, 3:].mean() < 0.25, freq[3:, 3:].mean()


def test_per_edge_mu_w_and_bias_injection():
    """Planted per-edge weight-prior means and per-neuron bias hypers show
    up in prior samples."""
    N, B = 5, 2
    mu_w = np.zeros((N, N, B), np.float32)
    mu_w[:, :2, :] = 2.0
    mu_w[:, 2:, :] = -1.0
    mu_bias = np.linspace(-3.0, 1.0, N).astype(np.float32)
    cfg = DenseNetworkConfig(N=N, B=B, learn_weight_prior=False,
                             mu_w=mu_w, sigma_w=0.01,
                             mu_bias=mu_bias, sigma_bias=0.01)
    obs = Bernoulli()
    draw = jax.jit(jax.vmap(lambda k: init_state_from_prior(
        k, obs, cfg, N, B, False)))
    st = draw(jax.random.split(jax.random.key(2), 400))
    W_mean = np.asarray(st.W).mean(axis=0)
    np.testing.assert_allclose(W_mean, mu_w, atol=0.05)
    np.testing.assert_allclose(np.asarray(st.b).mean(axis=0), mu_bias,
                               atol=0.05)


def test_per_edge_validation_errors():
    with pytest.raises(ValueError):
        ErdosRenyiConfig(N=4, B=1, rho_init=np.full((4, 4), 0.5),
                         learn_rho=True)
    with pytest.raises(ValueError):
        DenseNetworkConfig(N=4, B=1, sigma_w=np.ones((4, 4, 1, 1)),
                           learn_weight_prior=True)


# ---------------------------------------------------------------------------
# Latent-distance HMC: closed-form gradient + merged-kick integrator
# ---------------------------------------------------------------------------

def _ld_potential(cfg, L, gamma, A):
    """Independent re-statement of the latent-distance HMC potential."""
    d2 = jnp.sum((L[:, None, :] - L[None, :, :]) ** 2, axis=-1)
    lrho = gamma - d2
    ll = jnp.sum(A * lrho - jnp.logaddexp(lrho, 0.0))
    lp = (-0.5 * jnp.sum(L ** 2) / cfg.sigma_l ** 2
          - 0.5 * gamma ** 2 / cfg.sigma_gamma ** 2)
    return -(ll + lp)


def test_latent_distance_grad_matches_autodiff():
    """The closed-form _potential_grad must equal jax.grad of the
    potential (the HMC accept step uses the potential, the integrator the
    closed form — a mismatch silently breaks detailed balance)."""
    from pyglm_tpu.models.networks import LatentDistanceConfig
    N, dim = 13, 3
    cfg = LatentDistanceConfig(N=N, B=1, dim=dim, sigma_l=0.8,
                               sigma_gamma=1.7)
    key = jax.random.key(0)
    kL, kg, kA = jax.random.split(key, 3)
    L = jax.random.normal(kL, (N, dim), jnp.float32)
    gamma = jax.random.normal(kg, (), jnp.float32) * 0.5
    A = (jax.random.uniform(kA, (N, N)) < 0.4).astype(jnp.float32)

    gL_ad, gg_ad = jax.grad(
        lambda p: _ld_potential(cfg, p[0], p[1], A))((L, gamma))
    gL_cf, gg_cf = cfg._potential_grad((L, gamma), A)
    np.testing.assert_allclose(np.asarray(gL_cf), np.asarray(gL_ad),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(gg_cf), float(gg_ad),
                               rtol=1e-5, atol=1e-5)


def test_merged_kick_leapfrog_matches_two_kick():
    """The merged-kick (kick-drift-kick with shared interior gradients)
    trajectory must equal the textbook per-step half-kick integrator in
    exact arithmetic; check both endpoints after K steps."""
    from pyglm_tpu.models.networks import LatentDistanceConfig
    N, dim, K = 9, 2, 17
    cfg = LatentDistanceConfig(N=N, B=1, dim=dim)
    key = jax.random.key(3)
    kL, kA, km1, km2 = jax.random.split(key, 4)
    L = jax.random.normal(kL, (N, dim), jnp.float32)
    gamma = jnp.float32(0.3)
    A = (jax.random.uniform(kA, (N, N)) < 0.3).astype(jnp.float32)
    eps = 0.01
    grad = lambda p: cfg._potential_grad(p, A)
    tmap = jax.tree.map

    # reference: textbook two-half-kick leapfrog
    p_ref = (L, gamma)
    m_ref = (jax.random.normal(km1, (N, dim)), jax.random.normal(km2, ()))
    m0 = m_ref
    for _ in range(K):
        g = grad(p_ref)
        m_ref = tmap(lambda mi, gi: mi - 0.5 * eps * gi, m_ref, g)
        p_ref = tmap(lambda pi, mi: pi + eps * mi, p_ref, m_ref)
        g = grad(p_ref)
        m_ref = tmap(lambda mi, gi: mi - 0.5 * eps * gi, m_ref, g)

    # merged-kick form (as in LatentDistanceConfig.resample)
    p, m = (L, gamma), m0
    m = tmap(lambda mi, gi: mi - 0.5 * eps * gi, m, grad(p))
    for _ in range(K):
        p = tmap(lambda pi, mi: pi + eps * mi, p, m)
        m = tmap(lambda mi, gi: mi - eps * gi, m, grad(p))
    m = tmap(lambda mi, gi: mi + 0.5 * eps * gi, m, grad(p))

    for a, b in zip(jax.tree.leaves((p, m)), jax.tree.leaves((p_ref, m_ref))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)
