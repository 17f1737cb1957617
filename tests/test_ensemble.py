"""Lane-stacked multi-chain ensemble (models/ensemble.py).

The stacked sweep must be, per lane block, exactly the single-model Gibbs
sweep: C chains packed side by side share the design but must (a) match
the sequential ensemble's posterior marginals statistically and (b) stay
mutually independent. RNG streams differ between the two execution paths
(lane-shaped draws vs per-chain draws), so parity is distributional.
"""
import numpy as np
import pytest

import pyglm_tpu as pt


def _make_model(seed=0):
    return pt.SparseBernoulliGLM(
        6, B=2, L=5, seed=seed,
        net_kwargs=dict(rho_init=0.3, learn_rho=False, mu_bias=-1.5,
                        sigma_bias=0.3, sigma_w=0.8,
                        learn_weight_prior=False))


@pytest.fixture(scope="module")
def fitted_pair():
    true = _make_model(seed=42)
    Y = true.generate(800, keep=False)
    m = _make_model(seed=0)
    m.add_data(Y)
    seq = m.fit_ensemble(n_chains=4, n_samples=120, n_burnin=40,
                         stacked=False)
    stk = m.fit_ensemble(n_chains=4, n_samples=120, n_burnin=40,
                         stacked=True)
    return seq, stk


def test_stacked_contract_and_shapes(fitted_pair):
    seq, stk = fitted_pair
    for k in ("A", "W", "bias", "lls", "rhat_edge", "rhat_bias", "rhat_ll"):
        assert k in stk
    assert stk["A"].shape == seq["A"].shape == (4, 120, 6, 6)
    assert stk["W"].shape == (4, 120, 6, 6, 2)
    assert stk["bias"].shape == (4, 120, 6)
    assert stk["lls"].shape == (4, 120)
    assert np.isfinite(stk["lls"]).all()
    assert np.isfinite(stk["rhat_edge"]).all()


def test_stacked_matches_sequential_marginals(fitted_pair):
    """Pooled posterior functionals from the stacked run must agree with
    the sequential run within MC tolerance (480 pooled samples each)."""
    seq, stk = fitted_pair
    A_s = seq["A"].reshape(-1, 6, 6).mean(0)
    A_k = stk["A"].reshape(-1, 6, 6).mean(0)
    b_s = seq["bias"].reshape(-1, 6).mean(0)
    b_k = stk["bias"].reshape(-1, 6).mean(0)
    ll_s = seq["lls"].mean()
    ll_k = stk["lls"].mean()
    # Edge marginals: autocorrelated Bernoulli traces; 480 pooled samples
    # give an effective SE of a few percent per edge.
    assert np.max(np.abs(A_s - A_k)) < 0.22, (A_s, A_k)
    assert abs(A_s.mean() - A_k.mean()) < 0.08
    assert np.max(np.abs(b_s - b_k)) < 0.35, (b_s, b_k)
    assert abs(ll_s - ll_k) / abs(ll_s) < 0.02


def test_stacked_chains_are_distinct(fitted_pair):
    """Chains must evolve independently: distinct seeds -> distinct
    trajectories (a lane-packing bug that cross-wires chains would make
    lls/bias traces coincide)."""
    _, stk = fitted_pair
    lls = stk["lls"]
    for c in range(1, 4):
        assert not np.allclose(lls[0], lls[c])
        assert not np.allclose(stk["bias"][0], stk["bias"][c])


def test_collect_mean_matches_samples_exactly():
    """collect='mean' must reproduce the thin=1 samples path EXACTLY:
    the mean-mode scan derives its per-sweep keys identically
    (split(k, 1)[0] == the thin-mechanism key at thin=1), so per-chain
    posterior means and the ll traces agree to float tolerance, not just
    statistically."""
    true = _make_model(seed=42)
    Y = true.generate(600, keep=False)
    m = _make_model(seed=0)
    m.add_data(Y)
    stk = m.fit_ensemble(n_chains=3, n_samples=25, n_burnin=8,
                         stacked=True)
    mean = m.fit_ensemble(n_chains=3, n_samples=25, n_burnin=8,
                          collect="mean")
    # identical key streams -> identical sweeps -> identical ll traces
    np.testing.assert_array_equal(mean["lls"], stk["lls"])
    A_ref = stk["A"].mean(axis=1)
    Weff_ref = np.sum(stk["A"][..., None] * stk["W"], axis=-1).mean(axis=1)
    # accumulation order differs (running f32 sum vs stacked np.mean),
    # so tolerance is float roundoff, not MC error
    np.testing.assert_allclose(mean["A_mean"], A_ref, atol=1e-5)
    np.testing.assert_allclose(mean["Weff_mean"], Weff_ref, atol=1e-5)
    np.testing.assert_allclose(mean["A_mean_pooled"], A_ref.mean(0),
                               atol=1e-5)
    np.testing.assert_allclose(mean["Weff_mean_pooled"], Weff_ref.mean(0),
                               atol=1e-5)
    assert len(mean["final_states"]) == 3
    assert np.isfinite(mean["rhat_ll"])


def test_stacked_nb_aux_roundtrip():
    """NB family: per-chain dispersion aux must pack/unpack through the
    lane layout (a transposed-lane bug would mix chains' r values)."""
    m = pt.NonlinearAutoregressiveModel(
        6, B=2, L=5, observation="negative_binomial", network="erdos_renyi",
        spike_and_slab=True, seed=0,
        net_kwargs=dict(rho_init=0.2, learn_rho=False, mu_bias=-2.5,
                        sigma_bias=0.1, sigma_w=0.05,
                        learn_weight_prior=False))
    m.generate(400, keep=True)
    out = m.fit_ensemble(n_chains=3, n_samples=6, n_burnin=2, stacked=True)
    assert out["lls"].shape == (3, 6) and np.isfinite(out["lls"]).all()


def test_stacked_dense_model():
    """Dense (non-spike-slab) path through resample_dense at C*N lanes."""
    m = pt.BernoulliGLM(5, B=2, L=5, seed=1)
    m.generate(400, keep=True)
    out = m.fit_ensemble(n_chains=3, n_samples=6, n_burnin=2, stacked=True)
    assert out["A"].shape == (3, 6, 5, 5)
    assert np.all(out["A"] == 1.0)
    assert np.isfinite(out["lls"]).all()
