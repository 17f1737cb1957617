"""Composed chain x data parallelism: a 3-D ('chain','time','neuron') mesh
(VERDICT r4 missing #3 / next-round item #1).

fit_ensemble / fit_tempered on the composed mesh run the SAME lane-stacked
sweep as the unsharded path, but with the kernel shard_maps partitioning
the C*N postsyn-lane axis jointly over ('chain','neuron') and psum-ing
stats over 'time' (ensemble.make_stacked_sweep_gspmd /
tempering.make_tempered_sweep_gspmd). Parity is distributional: RNG
streams differ (per-lane-shard key folds), but pooled posterior
functionals must agree with the single-device stacked run within MC
tolerance — the same protocol as test_chain_mesh.py, now on the 2x2x2
mesh so every one of the three axes is actually cut.

Runs on the simulated 8-device CPU mesh (conftest.py).
"""
import numpy as np
import pytest

import jax

import pyglm_tpu as pt
from pyglm_tpu.parallel.sharding import make_chain_data_mesh


def _make_model(seed=0):
    return pt.SparseBernoulliGLM(
        6, B=2, L=5, seed=seed,
        net_kwargs=dict(rho_init=0.3, learn_rho=False, mu_bias=-1.5,
                        sigma_bias=0.3, sigma_w=0.8,
                        learn_weight_prior=False))


@pytest.fixture(scope="module")
def data_model():
    true = _make_model(seed=42)
    Y = true.generate(600, keep=False)
    m = _make_model(seed=0)
    m.add_data(Y)
    return m


@pytest.fixture(scope="module")
def mesh222():
    return make_chain_data_mesh(2, 2, 2)


def test_mesh_helper(mesh222):
    assert mesh222.shape == {"chain": 2, "time": 2, "neuron": 2}
    from pyglm_tpu.parallel.sharding import lane_axes, lane_count
    assert lane_axes(mesh222) == ("chain", "neuron")
    assert lane_count(mesh222) == 4


def test_ensemble_composed_contract(data_model, mesh222):
    import pyglm_tpu.models.weights as wm
    wm.LAST_SS_PATH = None
    out = data_model.fit_ensemble(n_chains=4, n_samples=12, n_burnin=6,
                                  mesh=mesh222)
    # the whole point of the composition: the collapsed spike-and-slab
    # update must ride the mesh-fused shard_map over the 3-D mesh, not a
    # silently-degraded single-device or staged trace
    assert wm.LAST_SS_PATH == "mesh_fused", wm.LAST_SS_PATH
    assert out["A"].shape == (4, 12, 6, 6)
    assert out["W"].shape == (4, 12, 6, 6, 2)
    assert out["bias"].shape == (4, 12, 6)
    assert out["lls"].shape == (4, 12)
    assert np.isfinite(out["lls"]).all()
    # chains must evolve independently across AND within chain groups
    for c in range(1, 4):
        assert not np.allclose(out["lls"][0], out["lls"][c])


def test_ensemble_composed_divisibility(data_model, mesh222):
    with pytest.raises(AssertionError, match="divisible"):
        data_model.fit_ensemble(n_chains=5, n_samples=8, mesh=mesh222)
    m = pt.SparseBernoulliGLM(5, B=2, L=5, seed=0)
    m.add_data(np.zeros((600, 5), np.float32))
    with pytest.raises(AssertionError, match="neuron mesh axis"):
        m.fit_ensemble(n_chains=4, n_samples=8, mesh=mesh222)


def test_tempered_composed_contract(data_model, mesh222):
    betas = np.linspace(0.97, 1.0, 4)
    out = data_model.fit_tempered(n_samples=12, n_burnin=6, betas=betas,
                                  mesh=mesh222)
    assert out["A"].shape == (12, 6, 6)
    assert np.isfinite(out["lls"]).all()
    assert np.allclose(out["betas"], betas)
    # a 0.01-gap ladder on 600 obs swaps readily; frozen swaps would mean
    # the cross-group lls gather or state exchange is wrong
    assert out["swap_rate"][1:-1].mean() > 0.3, out["swap_rate"]
    assert np.all(out["swap_rate"] <= 1.0)


def test_tempered_composed_rung_divisibility(data_model, mesh222):
    with pytest.raises(AssertionError, match="divisible"):
        data_model.fit_tempered(n_samples=8,
                                betas=np.linspace(0.99, 1, 3), mesh=mesh222)


def test_nb_ensemble_composed_smoke(mesh222):
    """NB family on the composed mesh: the per-chain dispersion aux and
    the gamma-series PG dispatch must survive the joint lane partition."""
    m = pt.NonlinearAutoregressiveModel(
        6, B=2, L=5, observation="negative_binomial",
        network="erdos_renyi", spike_and_slab=True, seed=0,
        obs_kwargs=dict(max_y=64),
        net_kwargs=dict(rho_init=0.2, learn_rho=False, mu_bias=-2.5,
                        sigma_bias=0.1, sigma_w=0.05,
                        learn_weight_prior=False))
    m.generate(300, keep=True)
    out = m.fit_ensemble(n_chains=4, n_samples=8, n_burnin=4, mesh=mesh222)
    assert out["A"].shape == (4, 8, 6, 6)
    assert np.isfinite(out["lls"]).all()
    for c in range(1, 4):
        assert not np.allclose(out["lls"][0], out["lls"][c])


@pytest.mark.slow
def test_ensemble_composed_matches_unsharded(data_model, mesh222):
    """Pooled posterior functionals: 8 chains on the 2x2x2 composed mesh
    vs the same 8 chains lane-stacked on one device (the test_chain_mesh
    protocol; 800 pooled samples each)."""
    shd = data_model.fit_ensemble(n_chains=8, n_samples=100, n_burnin=40,
                                  mesh=mesh222)
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
def test_tempered_composed_matches_unsharded(data_model, mesh222):
    """Cold-rung posterior functionals: the same ladder run on the
    composed mesh (rungs over chain groups, each rung time/neuron-sharded)
    vs single-device lane-stacked. A biased cross-group swap exchange
    drags the cold marginal toward the hot rungs and fails this."""
    betas = np.linspace(0.97, 1.0, 8)
    shd = data_model.fit_tempered(n_samples=250, n_burnin=50, betas=betas,
                                  mesh=mesh222)
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
    assert shd["swap_rate"][1:-1].mean() > 0.3
    assert unshd["swap_rate"][1:-1].mean() > 0.3
