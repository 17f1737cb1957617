"""Geweke joint-distribution tests (SURVEY.md §4 level 3): the stationary
marginals of the successive-conditional simulator must match the prior.
These catch conditional-update bugs that moment tests cannot."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # 3000-iter chains; quick lane: test_geweke_smoke.py

from pyglm_tpu.ops.basis import cosine_basis
from pyglm_tpu.models.observations import Bernoulli, Gaussian
from pyglm_tpu.models.networks import ErdosRenyiConfig, DenseNetworkConfig
from pyglm_tpu.diagnostics.geweke import geweke_chain

N, B, L, T = 3, 1, 3, 50
N_ITERS = 3000
THIN = 10


def _z(mean_emp, mean_true, var_true, n_eff):
    """z-score of an empirical mean against its sampling distribution."""
    return abs(mean_emp - mean_true) / np.sqrt(var_true / n_eff)


@pytest.fixture(scope="module")
def bernoulli_er_chain():
    basis = cosine_basis(B=B, L=L)
    obs = Bernoulli()
    net = ErdosRenyiConfig(
        N=N, B=B, rho_init=0.4, learn_rho=False, learn_weight_prior=False,
        sigma_w=0.5, mu_bias=-1.0, sigma_bias=0.3)
    return geweke_chain(jax.random.key(0), obs, net, N, B, basis, T,
                        spike_slab=True, n_iters=N_ITERS), net


def test_geweke_bias_marginal(bernoulli_er_chain):
    series, net = bernoulli_er_chain
    b = series["bias"][::THIN]           # (n, N)
    n_eff = b.shape[0] * N
    z = _z(b.mean(), net.mu_bias, net.sigma_bias ** 2, n_eff)
    assert z < 5.0, (b.mean(), z)
    # variance within 20%
    assert abs(b.var() / net.sigma_bias ** 2 - 1) < 0.25, b.var()


def test_geweke_adjacency_marginal(bernoulli_er_chain):
    series, net = bernoulli_er_chain
    dens = series["A_density"][::THIN]
    n_eff = dens.shape[0] * N * N
    z = _z(dens.mean(), net.rho_init, net.rho_init * (1 - net.rho_init), n_eff)
    assert z < 5.0, (dens.mean(), z)


def test_geweke_weight_marginal(bernoulli_er_chain):
    series, net = bernoulli_er_chain
    # Active weights ~ N(0, sigma_w); E[W_sq] per iteration =
    # n_active * sigma_w (B=1); inactive contribute 0.
    wsq = series["W_sq"][::THIN]
    nact = series["n_active"][::THIN]
    ratio = wsq.sum() / (nact.sum() * net.sigma_w)
    assert abs(ratio - 1) < 0.2, ratio
    # mean of active weights ~ 0
    wsum = series["W_sum"][::THIN]
    est_mean = wsum.sum() / nact.sum()
    se = np.sqrt(net.sigma_w / nact.sum())
    assert abs(est_mean) < 6 * se, (est_mean, se)


def test_geweke_learned_rho_marginal():
    """With rho ~ Beta(a, b) learned, its stationary marginal must be the
    Beta prior — exercises the network-resample conditional."""
    basis = cosine_basis(B=B, L=L)
    obs = Bernoulli()
    a_rho, b_rho = 3.0, 5.0
    net = ErdosRenyiConfig(
        N=N, B=B, a_rho=a_rho, b_rho=b_rho, rho_init=0.4, learn_rho=True,
        learn_weight_prior=False, sigma_w=0.5, mu_bias=-1.0, sigma_bias=0.3)
    series = geweke_chain(jax.random.key(1), obs, net, N, B, basis, T,
                          spike_slab=True, n_iters=N_ITERS)
    rho = series["rho"][::THIN]
    m_true = a_rho / (a_rho + b_rho)
    v_true = a_rho * b_rho / ((a_rho + b_rho) ** 2 * (a_rho + b_rho + 1))
    z = _z(rho.mean(), m_true, v_true, rho.shape[0])
    assert z < 5.0, (rho.mean(), m_true, z)
    assert abs(rho.var() / v_true - 1) < 0.35, (rho.var(), v_true)


def test_geweke_gaussian_dense():
    """Gaussian observations, dense weights: exercises the non-PG path and
    the eta inverse-gamma conditional."""
    basis = cosine_basis(B=B, L=L)
    a_eta, b_eta = 6.0, 2.0
    obs = Gaussian(a_eta=a_eta, b_eta=b_eta, eta_init=0.5)
    net = DenseNetworkConfig(
        N=N, B=B, learn_weight_prior=False, sigma_w=0.003,
        mu_bias=0.0, sigma_bias=0.1)
    series = geweke_chain(jax.random.key(2), obs, net, N, B, basis, T,
                          spike_slab=False, n_iters=N_ITERS)
    b = series["bias"][::THIN]
    z = _z(b.mean(), 0.0, 0.1 ** 2, b.size)
    assert z < 5.0, (b.mean(), z)
    eta = series["eta"][::THIN]
    m_true = b_eta / (a_eta - 1)                       # InvGamma mean
    v_true = b_eta ** 2 / ((a_eta - 1) ** 2 * (a_eta - 2))
    z = _z(eta.mean(), m_true, v_true, eta.size)
    assert z < 5.0, (eta.mean(), m_true, z)


def test_geweke_latent_distance():
    """Latent-distance prior: stationary marginal of the positions under
    the successive-conditional simulator must be N(0, sigma_l^2) — this
    exercises the HMC conditional end-to-end."""
    from pyglm_tpu.models.networks import LatentDistanceConfig
    basis = cosine_basis(B=B, L=L)
    obs = Bernoulli()
    sigma_l = 0.8
    net = LatentDistanceConfig(
        N=N, B=B, dim=2, sigma_l=sigma_l, sigma_gamma=1.0,
        hmc_eps=0.05, hmc_steps=10, hmc_iters=3, swap_moves=4,
        relocate_moves=4,
        learn_weight_prior=False, sigma_w=0.5, mu_bias=-1.0, sigma_bias=0.3)
    # collect L stats through a custom chain (geweke_chain reports generic
    # scalars; positions live in state.net.L)
    import jax
    from jax import lax
    from pyglm_tpu.ops.basis import design_matrix
    from pyglm_tpu.models.sweep import (
        GLMData, make_gibbs_sweep, make_generator, init_state_from_prior)
    sweep = make_gibbs_sweep(obs, net, N, B, True, t_chunk=64)
    gen = make_generator(obs, N, B)
    bas = jnp.asarray(basis)
    state0 = init_state_from_prior(jax.random.key(3), obs, net, N, B, True)

    def step(state, k):
        k1, k2 = jax.random.split(k)
        Y, _ = gen(k1, state, bas, T)
        state, _ = sweep(k2, state, (GLMData(Y=Y, Xf=design_matrix(Y, bas)),))
        return state, (state.net.L, state.net.gamma)

    keys = jax.random.split(jax.random.key(4), 2000)
    _, (Ls, gammas) = jax.jit(lambda s, ks: jax.lax.scan(step, s, ks))(
        state0, keys)
    Ls = np.asarray(Ls)[::THIN]
    n_eff = Ls[..., 0].size
    z = _z(Ls.mean(), 0.0, sigma_l ** 2, n_eff)
    assert z < 6.0, (Ls.mean(), z)
    assert abs(Ls.var() / sigma_l ** 2 - 1) < 0.3, Ls.var()
    g = np.asarray(gammas)[::THIN]
    z_g = _z(g.mean(), 0.0, 1.0, g.size)
    assert z_g < 6.0, (g.mean(), z_g)


def test_geweke_negative_binomial():
    """NB observations: exercises the gamma-series PG sampler (b = y + r
    spans regimes) and the CRT-based r conditional. The learned-r marginal
    must match its Gamma(a_r, b_r) prior. with_llc=True routes the r update
    through the collapsed-CRT (count-table binomial) path — the one the
    flagship NB model takes after add_data — so its exactness is gated
    jointly here, not just by the KS parity test."""
    from pyglm_tpu.models.observations import NegativeBinomial
    basis = cosine_basis(B=B, L=L)
    net = ErdosRenyiConfig(N=N, B=B, rho_init=0.4, learn_rho=False,
                           learn_weight_prior=False, sigma_w=0.01,
                           mu_bias=-1.5, sigma_bias=0.2)
    a_r, b_r = 4.0, 2.0
    obs = NegativeBinomial(r_init=3.0, resample_r=True, a_r=a_r, b_r=b_r,
                           max_y=128)
    series = geweke_chain(jax.random.key(5), obs, net, N, B, basis, T,
                          spike_slab=True, n_iters=N_ITERS, with_llc=True)
    b = series["bias"][::THIN]
    z = _z(b.mean(), -1.5, 0.2 ** 2, b.size)
    assert z < 5.0, (b.mean(), z)
    r = series["r"][::THIN]
    m_true, v_true = a_r / b_r, a_r / b_r ** 2
    z = _z(r.mean(), m_true, v_true, r.size)
    assert z < 5.0, (r.mean(), z)
    assert abs(r.var() / v_true - 1) < 0.35, r.var()


def test_geweke_learned_weight_prior():
    """NIW weight-prior learning — the (mu_W, Sigma_W | active weights)
    conjugate conditional (networks.py::_masked_niw_resample) — has its
    stationary hyper marginals checked against the NIW prior: Sigma ~
    IW(nu0, Psi0) and mu | Sigma ~ N(mu0, Sigma/kappa0). No other Geweke
    config runs with learn_weight_prior=True."""
    basis = cosine_basis(B=B, L=L)
    obs = Bernoulli()
    nu0, psi0, kappa0 = 6.0, 2.0, 2.0
    net = ErdosRenyiConfig(
        N=N, B=B, rho_init=0.4, learn_rho=False, learn_weight_prior=True,
        niw_mu0=0.0, niw_kappa0=kappa0, niw_nu0=nu0, niw_psi0=psi0,
        mu_bias=-1.0, sigma_bias=0.3)
    series = geweke_chain(jax.random.key(10), obs, net, N, B, basis, T,
                          spike_slab=True, n_iters=N_ITERS)
    # B=1: Sigma ~ IW_1(nu0, Psi0) = InvGamma(nu0/2, Psi0/2)
    Sig = series["prior_Sigma"][::THIN].reshape(-1)
    m_S = psi0 / (nu0 - 2.0)
    v_S = 2.0 * psi0 ** 2 / ((nu0 - 2.0) ** 2 * (nu0 - 4.0))
    z = _z(Sig.mean(), m_S, v_S, Sig.size)
    assert z < 5.0, (Sig.mean(), m_S, z)
    # marginal mu: mean mu0, variance E[Sigma]/kappa0
    mu = series["prior_mu"][::THIN].reshape(-1)
    v_mu = m_S / kappa0
    z = _z(mu.mean(), 0.0, v_mu, mu.size)
    assert z < 5.0, (mu.mean(), z)
    assert abs(mu.var() / v_mu - 1) < 0.3, mu.var()
    # bias conditional unchanged by the learned prior
    b = series["bias"][::THIN]
    z = _z(b.mean(), net.mu_bias, net.sigma_bias ** 2, b.size)
    assert z < 5.0, (b.mean(), z)


def test_geweke_binomial():
    """Binomial observations (n_trials > 1): every auxiliary draw is
    PG(n_trials, psi), so this runs the integer-b gamma-series dispatch
    (kappa = y - n/2) through the full model conditional loop — the one
    observation family the other Geweke configs never touch."""
    from pyglm_tpu.models.observations import Binomial
    basis = cosine_basis(B=B, L=L)
    obs = Binomial(n_trials=5)
    net = ErdosRenyiConfig(N=N, B=B, rho_init=0.4, learn_rho=False,
                           learn_weight_prior=False, sigma_w=0.3,
                           mu_bias=-1.0, sigma_bias=0.3)
    series = geweke_chain(jax.random.key(9), obs, net, N, B, basis, T,
                          spike_slab=True, n_iters=N_ITERS)
    b = series["bias"][::THIN]
    z = _z(b.mean(), net.mu_bias, net.sigma_bias ** 2, b.size)
    assert z < 5.0, (b.mean(), z)
    dens = series["A_density"][::THIN]
    z = _z(dens.mean(), 0.4, 0.24, dens.size * N * N)
    assert z < 5.0, (dens.mean(), z)
    wsq = series["W_sq"][::THIN]
    nact = series["n_active"][::THIN]
    ratio = wsq.sum() / (nact.sum() * net.sigma_w)
    assert abs(ratio - 1) < 0.25, ratio


def test_geweke_sbm():
    """SBM prior: the block connection-probability marginals must match
    their Beta(a, b) prior — exercises label Gibbs + block conjugates."""
    from pyglm_tpu.models.networks import SBMConfig
    basis = cosine_basis(B=B, L=L)
    obs = Bernoulli()
    a_rho, b_rho = 2.0, 3.0
    net = SBMConfig(N=N, B=B, K=2, a_rho=a_rho, b_rho=b_rho,
                    alpha_pi=1.0, sigma_w=0.5, niw_kappa0=1.0,
                    mu_bias=-1.0, sigma_bias=0.3)
    series = geweke_chain(jax.random.key(6), obs, net, N, B, basis, T,
                          spike_slab=True, n_iters=N_ITERS)
    rho = series["rho"][::THIN]            # (n, K, K)
    m_true = a_rho / (a_rho + b_rho)
    v_true = a_rho * b_rho / ((a_rho + b_rho) ** 2 * (a_rho + b_rho + 1))
    z = _z(rho.mean(), m_true, v_true, rho.shape[0] * 4)
    assert z < 5.0, (rho.mean(), m_true, z)
    b = series["bias"][::THIN]
    z = _z(b.mean(), -1.0, 0.3 ** 2, b.size)
    assert z < 5.0, (b.mean(), z)
    # label/pi marginals (sensitive to the self-edge term in the label
    # conditional): pi_0 ~ Beta(1, 1) stationary -> mean 1/2, var 1/12;
    # block-0 occupancy fraction must also average 1/2 by symmetry.
    pi0 = series["pi"][::THIN][:, 0]
    z = _z(pi0.mean(), 0.5, 1.0 / 12.0, pi0.size)
    assert z < 5.0, (pi0.mean(), z)
    assert abs(pi0.var() / (1.0 / 12.0) - 1) < 0.35, pi0.var()
    cf0 = series["c_frac"][::THIN][:, 0]
    z = _z(cf0.mean(), 0.5, cf0.var() + 1e-12, cf0.size)
    assert z < 5.0, (cf0.mean(), z)


def test_geweke_b2_cross_terms():
    """B=2 basis: the posterior precisions Lp = Lam0 + Jjj are non-diagonal
    2x2 blocks, so this exercises the unrolled small-B cholesky / forward /
    back-substitution CROSS-terms in the collapsed edge scan, which the
    B=1 configs never touch (VERDICT r2 weak #6)."""
    basis = cosine_basis(B=2, L=L)
    obs = Bernoulli()
    net = ErdosRenyiConfig(
        N=N, B=2, rho_init=0.4, learn_rho=False, learn_weight_prior=False,
        sigma_w=0.5, mu_bias=-1.0, sigma_bias=0.3)
    series = geweke_chain(jax.random.key(8), obs, net, N, 2, basis, T,
                          spike_slab=True, n_iters=N_ITERS)
    b = series["bias"][::THIN]
    z = _z(b.mean(), net.mu_bias, net.sigma_bias ** 2, b.size)
    assert z < 5.0, (b.mean(), z)
    dens = series["A_density"][::THIN]
    z = _z(dens.mean(), 0.4, 0.24, dens.size * N * N)
    assert z < 5.0, (dens.mean(), z)
    # Active coefficients ~ N(0, sigma_w) iid across the B=2 basis dims.
    wsq = series["W_sq"][::THIN]
    nact = series["n_active"][::THIN]
    ratio = wsq.sum() / (nact.sum() * 2 * net.sigma_w)
    assert abs(ratio - 1) < 0.2, ratio
    wsum = series["W_sum"][::THIN]
    est_mean = wsum.sum() / (nact.sum() * 2)
    se = np.sqrt(net.sigma_w / (nact.sum() * 2))
    assert abs(est_mean) < 6 * se, (est_mean, se)


def test_geweke_gaussian_sparse():
    """Sparse Gaussian observations through the spike-and-slab scan —
    marginals must match the prior. (The cached-Gram fast path is covered
    by the exact-equality test in test_model.py.)"""
    basis = cosine_basis(B=B, L=L)
    obs = Gaussian(a_eta=6.0, b_eta=2.0, eta_init=0.5)
    net = ErdosRenyiConfig(
        N=N, B=B, rho_init=0.4, learn_rho=False, learn_weight_prior=False,
        sigma_w=0.003, mu_bias=0.0, sigma_bias=0.1)
    series = geweke_chain(jax.random.key(7), obs, net, N, B, basis, T,
                          spike_slab=True, n_iters=N_ITERS)
    b = series["bias"][::THIN]
    z = _z(b.mean(), 0.0, 0.1 ** 2, b.size)
    assert z < 5.0, (b.mean(), z)
    dens = series["A_density"][::THIN]
    z = _z(dens.mean(), 0.4, 0.24, dens.size * N * N)
    assert z < 5.0, (dens.mean(), z)
