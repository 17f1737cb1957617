"""Chain-axis device parallelism (ensemble + tempering on a ('chain',) mesh).

make_stacked_sweep_sharded / make_tempered_sweep_sharded run each device's
rung group through the SAME local lane-stacked sweep the unsharded paths
use, so parity is distributional: RNG streams differ (per-device key
folds), but pooled posterior functionals must agree within MC tolerance
with the single-device stacked run. The tempered sweep's only cross-device
traffic is the (C,) log-likelihood gather + the accepted swap exchange;
a wrong gather or exchange biases the cold rung and fails the parity test.

Runs on the simulated 8-device CPU mesh (conftest.py).
"""
import numpy as np
import pytest

import jax

import pyglm_tpu as pt
from pyglm_tpu.parallel.sharding import make_chain_mesh


def _make_model(seed=0):
    return pt.SparseBernoulliGLM(
        6, B=2, L=5, seed=seed,
        net_kwargs=dict(rho_init=0.3, learn_rho=False, mu_bias=-1.5,
                        sigma_bias=0.3, sigma_w=0.8,
                        learn_weight_prior=False))


@pytest.fixture(scope="module")
def data_model():
    true = _make_model(seed=42)
    Y = true.generate(700, keep=False)
    m = _make_model(seed=0)
    m.add_data(Y)
    return m


def test_chain_mesh_helper():
    mesh = make_chain_mesh()
    assert mesh.shape == {"chain": len(jax.devices())}
    mesh2 = make_chain_mesh(2)
    assert mesh2.shape == {"chain": 2}


def test_ensemble_chain_mesh_contract(data_model):
    mesh = make_chain_mesh(4)
    out = data_model.fit_ensemble(n_chains=8, n_samples=20, n_burnin=10,
                                  mesh=mesh)
    assert out["A"].shape == (8, 20, 6, 6)
    assert out["W"].shape == (8, 20, 6, 6, 2)
    assert out["bias"].shape == (8, 20, 6)
    assert out["lls"].shape == (8, 20)
    assert np.isfinite(out["lls"]).all()
    # chains must evolve independently across AND within devices
    for c in range(1, 8):
        assert not np.allclose(out["lls"][0], out["lls"][c])


def test_ensemble_chain_mesh_divisibility(data_model):
    mesh = make_chain_mesh(8)
    with pytest.raises(AssertionError, match="divisible"):
        data_model.fit_ensemble(n_chains=6, n_samples=8, mesh=mesh)
    with pytest.raises(AssertionError, match="chain"):
        from pyglm_tpu.parallel.sharding import make_mesh
        data_model.fit_ensemble(n_chains=8, n_samples=8,
                                mesh=make_mesh(n_time=1))


def test_tempered_chain_mesh_contract(data_model):
    mesh = make_chain_mesh(8)
    betas = np.linspace(0.97, 1.0, 8)
    out = data_model.fit_tempered(n_samples=20, n_burnin=10, betas=betas,
                                  mesh=mesh)
    assert out["A"].shape == (20, 6, 6)
    assert np.isfinite(out["lls"]).all()
    assert np.allclose(out["betas"], betas)
    # a 0.004-gap ladder on 700 obs swaps readily; frozen swaps would mean
    # the lls gather or the exchange is wrong
    assert out["swap_rate"][1:-1].mean() > 0.3, out["swap_rate"]


def test_tempered_chain_mesh_rung_divisibility(data_model):
    mesh = make_chain_mesh(8)
    with pytest.raises(AssertionError, match="divisible"):
        data_model.fit_tempered(n_samples=8, betas=np.linspace(0.99, 1, 6),
                                mesh=mesh)


@pytest.mark.slow
def test_ensemble_chain_mesh_matches_unsharded(data_model):
    """Pooled posterior functionals: 8 chains on the 8-device chain mesh
    vs the same 8 chains lane-stacked on one device (the test_ensemble
    parity protocol; 800 pooled samples each)."""
    mesh = make_chain_mesh(8)
    shd = data_model.fit_ensemble(n_chains=8, n_samples=100, n_burnin=40,
                                  mesh=mesh)
    stk = data_model.fit_ensemble(n_chains=8, n_samples=100, n_burnin=40)
    A_s = shd["A"].reshape(-1, 6, 6).mean(0)
    A_k = stk["A"].reshape(-1, 6, 6).mean(0)
    b_s = shd["bias"].reshape(-1, 6).mean(0)
    b_k = stk["bias"].reshape(-1, 6).mean(0)
    assert np.max(np.abs(A_s - A_k)) < 0.22, (A_s, A_k)
    assert abs(A_s.mean() - A_k.mean()) < 0.08
    assert np.max(np.abs(b_s - b_k)) < 0.35, (b_s, b_k)
    ll_s, ll_k = shd["lls"].mean(), stk["lls"].mean()
    assert abs(ll_s - ll_k) / abs(ll_s) < 0.02


@pytest.mark.slow
def test_tempered_chain_mesh_matches_unsharded(data_model):
    """Cold-rung posterior functionals: the same ladder run rung-per-device
    vs single-device lane-stacked (the test_tempering exactness protocol).
    A biased swap exchange (wrong source rung, stale lls) drags the cold
    marginal toward the hot rungs and fails this."""
    betas = np.linspace(0.97, 1.0, 8)
    mesh = make_chain_mesh(8)
    shd = data_model.fit_tempered(n_samples=250, n_burnin=50, betas=betas,
                                  mesh=mesh)
    unshd = data_model.fit_tempered(n_samples=250, n_burnin=50, betas=betas)
    A_s = shd["A"].mean(0)
    A_u = unshd["A"].mean(0)
    b_s = shd["bias"].mean(0)
    b_u = unshd["bias"].mean(0)
    assert np.max(np.abs(A_s - A_u)) < 0.22, (A_s, A_u)
    assert abs(A_s.mean() - A_u.mean()) < 0.08
    assert np.max(np.abs(b_s - b_u)) < 0.35, (b_s, b_u)
    ll_s, ll_u = shd["lls"].mean(), unshd["lls"].mean()
    assert abs(ll_s - ll_u) / abs(ll_s) < 0.02
    # both runs' interior rungs swap at comparable healthy rates
    assert shd["swap_rate"][1:-1].mean() > 0.3
    assert unshd["swap_rate"][1:-1].mean() > 0.3


def test_nb_ensemble_chain_mesh_smoke():
    """NB family: per-chain dispersion aux must survive the shard_map
    lane packing (chain-major aux reshapes inside each device's body)."""
    m = pt.NonlinearAutoregressiveModel(
        5, B=2, L=5, observation="negative_binomial",
        network="erdos_renyi", spike_and_slab=True, seed=0,
        obs_kwargs=dict(max_y=64),
        net_kwargs=dict(rho_init=0.2, learn_rho=False, mu_bias=-2.5,
                        sigma_bias=0.1, sigma_w=0.05,
                        learn_weight_prior=False))
    m.generate(300, keep=True)
    out = m.fit_ensemble(n_chains=4, n_samples=10, n_burnin=5,
                         mesh=make_chain_mesh(4))
    assert out["A"].shape == (4, 10, 5, 5)
    assert np.isfinite(out["lls"]).all()
    for c in range(1, 4):
        assert not np.allclose(out["lls"][0], out["lls"][c])
