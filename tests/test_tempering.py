"""Parallel tempering (models/tempering.py + GLM.fit_tempered).

Exactness requirement: the COLD (beta = 1) rung of the tempered ensemble
targets the standard posterior — replica-exchange swaps are Metropolis
moves on the joint density of the ladder, so they leave every rung's
marginal invariant. The statistical test compares cold-rung posterior
functionals against a plain fit_compiled chain on the same data; a wrong
swap acceptance (sign, wrong ll, tempered-vs-untempered confusion) biases
the cold marginal toward the hot rungs' flatter posteriors and fails it.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pyglm_tpu as pt
from pyglm_tpu.models.tempering import suggest_ladder, swap_permutation


def _make_model(seed=0):
    return pt.SparseBernoulliGLM(
        6, B=2, L=5, seed=seed,
        net_kwargs=dict(rho_init=0.3, learn_rho=False, mu_bias=-1.5,
                        sigma_bias=0.3, sigma_w=0.8,
                        learn_weight_prior=False))


def test_swap_permutation_is_pairwise():
    """The returned perm must be an involution built from adjacent pairs:
    applying it twice is the identity, and every move is to a neighbor."""
    betas = jnp.asarray(np.linspace(0.9, 1.0, 6), jnp.float32)
    for s in range(20):
        lls = jax.random.normal(jax.random.key(100 + s), (6,)) * 50.0
        perm, acc, parity = swap_permutation(jax.random.key(s), lls, betas)
        p = np.asarray(perm)
        assert np.array_equal(p[p], np.arange(6))
        assert np.max(np.abs(p - np.arange(6))) <= 1
        assert np.array_equal(np.asarray(acc) > 0, p != np.arange(6))


def test_swap_always_accepts_at_equal_beta():
    """Equal temperatures: log alpha = 0, so every valid pair must swap
    (log u < 0 a.s.) — the degenerate case that catches an inverted
    acceptance inequality."""
    betas = jnp.ones(4, jnp.float32)
    lls = jnp.asarray([-10.0, 40.0, 7.0, -3.0])
    for s in range(10):
        perm, acc, parity = swap_permutation(jax.random.key(s), lls, betas)
        p = np.asarray(perm)
        assert not np.array_equal(p, np.arange(4))     # someone swapped
        valid = np.ones(4, bool)
        if int(parity) == 1:
            valid[0] = valid[-1] = False
        assert np.all((p != np.arange(4)) == valid)


def test_suggest_ladder_shape_and_monotone():
    betas, span = suggest_ladder(2000.0, 8, accept=0.3)
    assert betas.shape == (8,) and betas[-1] == 1.0
    assert np.all(np.diff(betas) > 0)
    d = np.diff(betas)
    assert np.allclose(d, d[0])
    assert span == pytest.approx(d[0] * 7)


def test_fit_tempered_contract():
    """Shape/diagnostic contract at an explicit ladder (no pilot)."""
    true = _make_model(seed=42)
    Y = true.generate(600, keep=False)
    m = _make_model(seed=0)
    m.add_data(Y)
    betas = np.linspace(0.97, 1.0, 4)
    out = m.fit_tempered(n_samples=30, n_burnin=20, betas=betas)
    assert out["A"].shape == (30, 6, 6)
    assert out["W"].shape == (30, 6, 6, 2)
    assert out["bias"].shape == (30, 6)
    assert out["lls"].shape == (30,)
    assert np.isfinite(out["lls"]).all()
    assert np.allclose(out["betas"], betas)
    # per-attempt rates: EXACT attempt counts (actual parity tallies for
    # the end rungs), so every rate is a true probability in [0, 1]
    assert out["swap_rate"].shape == (4,)
    assert np.all(out["swap_rate"] >= 0) and np.all(out["swap_rate"] <= 1.0)
    # a 0.01-gap ladder at this tiny model's sd(ll) accepts often
    assert out["swap_rate"][1:-1].mean() > 0.05, out["swap_rate"]
    assert out["ladder_span"] == pytest.approx(betas[-1] - betas[0])
    assert out["sd_ll"] is None and out["pilot_sweeps"] == 0


def test_suggest_ladder_clamps_infeasible():
    """Tiny sd(ll): the acceptance-targeted gap would push beta_1 <= 0;
    the ladder must clamp to a positive floor and warn (ADVICE r4)."""
    with pytest.warns(UserWarning, match="clamping"):
        betas, span = suggest_ladder(2.0, 8, accept=0.3)
    assert np.all(betas > 0) and betas[-1] == 1.0
    assert np.all(np.diff(betas) > 0)


def test_fit_tempered_validates_betas():
    true = _make_model(seed=42)
    Y = true.generate(300, keep=False)
    m = _make_model(seed=0)
    m.add_data(Y)
    with pytest.raises(AssertionError, match="positive"):
        m.fit_tempered(n_samples=4, betas=np.asarray([-0.1, 0.5, 1.0]))
    with pytest.raises(AssertionError, match="ascending"):
        m.fit_tempered(n_samples=4, betas=np.asarray([1.0, 0.5, 0.2]))
    with pytest.raises(AssertionError, match="beta=1"):
        m.fit_tempered(n_samples=4, betas=np.asarray([0.5, 0.9]))


def test_fit_tempered_warns_on_narrow_auto_ladder():
    """A large-sd(ll) posterior makes the pilot-chosen ladder narrow; the
    user must be told the feasible span (VERDICT r4 weak #4). sd(ll) scales
    like sqrt(d_eff/2), so only big models produce this naturally — stub
    the pilot to return a config-5-scale fluctuation instead."""
    true = _make_model(seed=42)
    Y = true.generate(300, keep=False)
    m = _make_model(seed=0)
    m.add_data(Y)
    lls = np.tile(np.asarray([-1000.0, 1000.0]), 20)     # sd(ll) = 1000
    m.fit_compiled = lambda **kw: {"lls": lls}
    with pytest.warns(UserWarning, match="NARROW"):
        out = m.fit_tempered(n_samples=8, n_burnin=4, n_rungs=3,
                             pilot_sweeps=30)
    assert out["sd_ll"] == pytest.approx(1000.0)
    assert out["pilot_sweeps"] == 60
    assert 0 < out["ladder_span"] < 0.01


_NB_NET = dict(rho_init=0.2, learn_rho=False, mu_bias=-2.5,
               sigma_bias=0.1, sigma_w=0.05, learn_weight_prior=False)


def test_fit_tempered_blocks_resampled_likelihood_aux():
    """NB with resample_r=True (and Gaussian with resample_eta=True) must
    refuse: the conjugate aux updates assume the untempered likelihood."""
    m = pt.NonlinearAutoregressiveModel(
        4, B=2, L=5, observation="negative_binomial",
        network="erdos_renyi", spike_and_slab=True, seed=0,
        net_kwargs=_NB_NET)
    m.generate(200, keep=True)
    with pytest.raises(AssertionError, match="resample_r"):
        m.fit_tempered(n_samples=4, betas=np.asarray([0.99, 1.0]))
    g = pt.NonlinearAutoregressiveModel(
        4, B=2, L=5, observation="gaussian", network="erdos_renyi",
        spike_and_slab=True, seed=0, net_kwargs=_NB_NET)
    g.generate(200, keep=True)
    with pytest.raises(AssertionError, match="resample_eta"):
        g.fit_tempered(n_samples=4, betas=np.asarray([0.99, 1.0]))


@pytest.mark.parametrize("obs,okw", [
    ("negative_binomial", dict(resample_r=False)),
    ("binomial", dict(n_trials=3)),
    ("gaussian", dict(resample_eta=False, eta_init=0.5)),
])
def test_fit_tempered_other_families(obs, okw):
    """Power-posterior tempering for the non-Bernoulli families: the
    beta-power likelihood stays PG-conjugate (shape/precision scales), so
    the tempered sweep must run and swap at a tight ladder."""
    m = pt.NonlinearAutoregressiveModel(
        5, B=2, L=5, observation=obs, network="erdos_renyi",
        spike_and_slab=True, seed=0, obs_kwargs=okw, net_kwargs=_NB_NET)
    m.generate(300, keep=True)
    out = m.fit_tempered(n_samples=10, n_burnin=5,
                         betas=np.linspace(0.99, 1.0, 3))
    assert out["A"].shape == (10, 5, 5)
    assert np.isfinite(out["lls"]).all()
    assert np.all(out["swap_rate"] >= 0)
    # a 0.005-gap ladder swaps readily on 300 obs
    assert out["swap_rate"].mean() > 0.05, out["swap_rate"]


@pytest.mark.slow
def test_tempered_cold_chain_matches_untempered():
    """Statistical exactness of the cold rung: posterior edge-inclusion,
    bias, and LL functionals from fit_tempered must agree with the plain
    chain within pooled-MC tolerance (same protocol as the ensemble
    parity test). The pilot-ladder path (betas=None) is exercised here."""
    true = _make_model(seed=7)
    Y = true.generate(800, keep=False)
    m = _make_model(seed=0)
    m.add_data(Y)
    plain = m.fit_ensemble(n_chains=4, n_samples=150, n_burnin=60)
    tmp = m.fit_tempered(n_samples=600, n_burnin=60, n_rungs=4,
                         pilot_sweeps=100)
    A_p = plain["A"].reshape(-1, 6, 6).mean(0)
    A_t = tmp["A"].mean(0)
    b_p = plain["bias"].reshape(-1, 6).mean(0)
    b_t = tmp["bias"].mean(0)
    assert np.max(np.abs(A_p - A_t)) < 0.22, (A_p, A_t)
    assert abs(A_p.mean() - A_t.mean()) < 0.08
    assert np.max(np.abs(b_p - b_t)) < 0.35, (b_p, b_t)
    ll_p, ll_t = plain["lls"].mean(), tmp["lls"].mean()
    assert abs(ll_p - ll_t) / abs(ll_p) < 0.02
    assert np.all(tmp["swap_rate"] >= 0)
