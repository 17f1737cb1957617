"""End-to-end model tests: API surface, generation, and posterior recovery
on small synthetic configs (SURVEY.md §4 test pyramid level 4)."""
import numpy as np
import jax.numpy as jnp
import pytest

import pyglm_tpu as pt


def _auc(scores, labels):
    """Link-detection AUC without sklearn."""
    scores = np.asarray(scores).ravel()
    labels = np.asarray(labels).ravel().astype(bool)
    pos, neg = scores[labels], scores[~labels]
    if len(pos) == 0 or len(neg) == 0:
        return 1.0
    return (pos[:, None] > neg[None, :]).mean() + 0.5 * (
        pos[:, None] == neg[None, :]).mean()


def test_api_surface():
    m = pt.SparseBernoulliGLM(4, B=2, L=5, seed=0)
    Y = m.generate(100, keep=True)
    assert Y.shape == (100, 4)
    assert m.A.shape == (4, 4) and m.W.shape == (4, 4, 2)
    assert m.bias.shape == (4,) and m.W_effective.shape == (4, 4)
    d = m.resample_model()
    assert set(d) == {"log_likelihood", "n_edges"}
    assert np.isfinite(m.log_likelihood())
    assert m.means[0].shape == (100, 4)
    snap = m.copy_sample()
    assert snap.A.shape == (4, 4)
    # log-likelihood of explicit held-out data
    Y2 = m.generate(50, keep=False)
    assert np.isfinite(m.log_likelihood(Y2))


def test_generate_rate_reflects_bias():
    # Strongly negative bias, no connections -> near-silent spikes.
    m = pt.NonlinearAutoregressiveModel(
        3, B=2, L=4, observation="bernoulli", network="erdos_renyi",
        spike_and_slab=True, seed=1,
        net_kwargs=dict(rho_init=1e-5, mu_bias=-4.0, sigma_bias=0.01))
    Y = m.generate(4000, keep=False)
    rate = Y.mean()
    assert 0.005 < rate < 0.06, rate   # logistic(-4) ~ 0.018


@pytest.mark.slow
def test_bernoulli_sparse_recovery():
    """Generate from a planted sparse model; Gibbs must recover the links
    (AUC) and weights (correlation) — the reference's demo-driven check."""
    N, B, L, T = 8, 2, 6, 8000
    true = pt.SparseBernoulliGLM(
        N, B=B, L=L, seed=42,
        net_kwargs=dict(rho_init=0.3, learn_rho=False, mu_bias=-1.5,
                        sigma_bias=0.1, learn_weight_prior=False,
                        sigma_w=2.0))
    Y = true.generate(T, keep=False)
    assert 0.02 < Y.mean() < 0.6

    model = pt.SparseBernoulliGLM(N, B=B, L=L, seed=0)
    model.add_data(Y)
    lls = []
    A_acc = np.zeros((N, N))
    W_acc = np.zeros((N, N))
    n_keep = 0
    for it in range(80):
        diag = model.resample_model()
        lls.append(diag["log_likelihood"])
        if it >= 40:
            A_acc += model.A
            W_acc += model.W_effective
            n_keep += 1
    # Chain moves uphill from the prior draw.
    assert np.mean(lls[-10:]) > lls[0] + 10
    auc = _auc(A_acc / n_keep, true.A)
    assert auc > 0.8, f"link AUC {auc:.3f}"
    # Effective-weight correlation on true-active edges.
    mask = true.A.astype(bool)
    corr = np.corrcoef(W_acc[mask] / n_keep,
                       true.W_effective[mask])[0, 1]
    assert corr > 0.6, f"weight corr {corr:.3f}"


@pytest.mark.slow
def test_gaussian_dense_recovery():
    N, B, L, T = 5, 2, 4, 4000
    # Small planted weights keep the linear AR dynamics stable
    # (spectral radius < 1); larger priors genuinely diverge.
    true = pt.GaussianGLM(N, B=B, L=L, seed=7,
                          net_kwargs=dict(learn_weight_prior=False,
                                          sigma_w=0.002))
    Y = true.generate(T, keep=False)
    assert np.all(np.isfinite(Y))
    model = pt.GaussianGLM(N, B=B, L=L, seed=1)
    model.add_data(Y)
    for _ in range(40):
        model.resample_model()
    # Average posterior weights over a few more sweeps.
    West = np.zeros((N, N))
    for _ in range(20):
        model.resample_model()
        West += model.W_effective / 20
    corr = np.corrcoef(West.ravel(), true.W_effective.ravel())[0, 1]
    assert corr > 0.8, f"weight corr {corr:.3f}"
    # Noise variance estimated within 2x.
    eta = np.asarray(model.state.aux["eta"])
    eta_true = np.asarray(true.state.aux["eta"])
    assert np.all(eta < 4 * eta_true) and np.all(eta > eta_true / 4)


@pytest.mark.slow
def test_nb_model_runs_and_r_sane():
    m = pt.NegativeBinomialGLM(4, B=2, L=4, seed=3,
                               obs_kwargs=dict(max_y=64, r_init=3.0))
    Y = m.generate(1500, keep=True)
    assert Y.max() < 1000   # stable regime
    for _ in range(10):
        d = m.resample_model()
    assert np.isfinite(d["log_likelihood"])
    r = np.asarray(m.state.aux["r"])
    assert np.all(r > 0.01) and np.all(r < 100)


@pytest.mark.slow
@pytest.mark.parametrize("network", ["sbm", "latent_distance"])
def test_structured_networks_run(network):
    m = pt.NonlinearAutoregressiveModel(
        6, B=2, L=4, observation="bernoulli", network=network,
        spike_and_slab=True, seed=4)
    m.generate(500, keep=True)
    for _ in range(5):
        d = m.resample_model()
    assert np.isfinite(d["log_likelihood"])
    if network == "sbm":
        assert m.state.net.c.shape == (6,)
        assert np.allclose(np.asarray(m.state.net.pi).sum(), 1.0, atol=1e-4)
    else:
        assert m.state.net.L.shape == (6, 2)


@pytest.mark.slow
def test_sbm_label_recovery():
    """Two clearly separated blocks: dense within block 0, empty elsewhere."""
    N, K = 10, 2
    A = np.zeros((N, N), np.float32)
    A[:5, :5] = 1.0
    W = np.zeros((N, N, 2), np.float32)
    W[:5, :5] = 1.0
    from pyglm_tpu.models.networks import SBMConfig
    import jax
    cfg = SBMConfig(N=N, B=2, K=K, rho_init=0.5)
    state = cfg.init_state(jax.random.key(0))
    for i in range(30):
        state = cfg.resample(jax.random.fold_in(jax.random.key(1), i),
                             state, jnp.asarray(A), jnp.asarray(W))
    c = np.asarray(state.c)
    # Block labels must separate the two groups (up to label symmetry).
    assert len(set(c[:5].tolist())) == 1
    assert len(set(c[5:].tolist())) == 1
    assert c[0] != c[5]


def test_multiple_datasets():
    m = pt.SparseBernoulliGLM(4, B=2, L=4, seed=5)
    m.generate(300, keep=True)
    m.generate(200, keep=True)
    assert len(m.datas) == 2
    d = m.resample_model()
    assert np.isfinite(d["log_likelihood"])
    assert len(m.means) == 2


def test_fit_returns_samples():
    m = pt.SparseBernoulliGLM(4, B=2, L=4, seed=6)
    m.generate(300, keep=True)
    out = m.fit(n_samples=6, n_burnin=2, thin=2)
    # thin contract matches fit_compiled: n_samples samples from
    # n_burnin + n_samples*thin sweeps.
    assert out["A"].shape == (6, 4, 4)
    assert out["W"].shape == (6, 4, 4, 2)
    assert out["bias"].shape == (6, 4)
    assert np.all(np.isfinite(out["lls"]))


@pytest.mark.slow
def test_forecast():
    m = pt.SparseBernoulliGLM(5, B=2, L=4, seed=0)
    m.generate(400, keep=True)
    for _ in range(3):
        m.resample_model()
    F = m.forecast(50, n_samples=3, thin=1)
    assert F.shape == (3, 50, 5)
    assert set(np.unique(F)) <= {0.0, 1.0}
    # forecasts differ across posterior samples
    assert not np.array_equal(F[0], F[1])
    # short-history edge case: dataset shorter than L
    m2 = pt.SparseBernoulliGLM(3, B=2, L=8, seed=1)
    m2.add_data(np.zeros((5, 3), np.float32))
    m2.resample_model()
    F2 = m2.forecast(10, n_samples=1, thin=0)
    assert F2.shape == (1, 10, 3)


def test_gaussian_cached_gram_exact():
    """The Gaussian fast path (stats = cached unweighted Gram / eta) must
    equal the directly-computed weighted Gram to matmul precision, and the
    sparse-Gaussian model must produce identical chains whether or not the
    cache is present."""
    import jax
    import jax.numpy as jnp
    from pyglm_tpu.models.weights import group_gram_blocks, _auto_group
    from pyglm_tpu.models.sweep import GLMData

    m = pt.SparseGaussianGLM(6, B=2, L=4, seed=0)
    Y = m.generate(600, keep=True)
    d = m.datas[0]
    assert d.Gg0 is not None
    eta = m.state.aux["eta"]
    G = _auto_group(6)
    direct = group_gram_blocks(
        d.Xf, jnp.broadcast_to(1.0 / eta[None, :], d.Y.shape), 2, G)
    cached = d.Gg0 * (1.0 / eta)[None, :, None, None]
    np.testing.assert_allclose(np.asarray(direct), np.asarray(cached),
                               rtol=2e-4, atol=2e-4)

    # identical chain trajectories with and without the cache
    m_nc = pt.SparseGaussianGLM(6, B=2, L=4, seed=0)
    m_nc.generate(600, keep=True)          # same seed -> same Y and state
    m_nc.datas = [GLMData(Y=dd.Y, Xf=dd.Xf) for dd in m_nc.datas]  # drop cache
    for _ in range(3):
        d1 = m.resample_model()
        d2 = m_nc.resample_model()
    assert abs(d1["log_likelihood"] - d2["log_likelihood"]) < 0.5, (d1, d2)


@pytest.mark.slow
def test_fit_compiled_matches_fit_statistically():
    true = pt.SparseBernoulliGLM(
        6, B=2, L=4, seed=9,
        net_kwargs=dict(rho_init=0.4, learn_rho=False, sigma_w=1.5,
                        mu_bias=-1.0, learn_weight_prior=False))
    Y = true.generate(3000, keep=False)

    m1 = pt.SparseBernoulliGLM(6, B=2, L=4, seed=0)
    m1.add_data(Y)
    out1 = m1.fit(n_samples=40, n_burnin=20)

    m2 = pt.SparseBernoulliGLM(6, B=2, L=4, seed=1)
    m2.add_data(Y)
    out2 = m2.fit_compiled(n_samples=40, n_burnin=20)

    assert out2["A"].shape == (40, 6, 6)
    assert out2["W"].shape == (40, 6, 6, 2)
    assert np.all(np.isfinite(out2["lls"]))
    # same posterior: aggregate functionals agree within MC tolerance
    # (per-edge marginals are too noisy at 40 correlated samples)
    assert abs(out1["A"].mean() - out2["A"].mean()) < 0.12
    assert abs(out1["lls"][-10:].mean() - out2["lls"][-10:].mean()) < 60


def test_fit_compiled_thin_and_zero_burnin():
    m = pt.SparseBernoulliGLM(4, B=2, L=4, seed=2)
    m.generate(400, keep=True)
    out = m.fit_compiled(n_samples=5, n_burnin=0, thin=3)
    assert out["A"].shape == (5, 4, 4) and out["lls"].shape == (5,)


def test_fit_ensemble_rhat():
    m = pt.SparseBernoulliGLM(4, B=2, L=4, seed=3)
    m.generate(400, keep=True)
    b_before = m.bias.copy()
    key_before = m._key
    out = m.fit_ensemble(n_chains=2, n_samples=8, n_burnin=4)
    assert out["A"].shape == (2, 8, 4, 4)
    assert out["W"].shape == (2, 8, 4, 4, 2)
    assert out["bias"].shape == (2, 8, 4)
    assert out["rhat_edge"].shape == (4, 4)
    assert out["rhat_bias"].shape == (4,)
    # +inf is a legitimate value (a frozen-but-disagreeing edge); NaN is not
    assert not np.isnan(out["rhat_edge"]).any()
    assert np.isfinite(out["rhat_ll"])
    # chains differ (independent prior inits actually ran)
    assert not np.array_equal(out["bias"][0], out["bias"][1])
    # the model's own chain state and key stream are untouched
    assert np.array_equal(m.bias, b_before)
    assert m._key is key_before


def test_chain_reproducibility_same_seed():
    """Counter-based RNG discipline end-to-end: two identically-seeded
    models on the same data must produce bit-identical chains (SURVEY.md
    §5 race-detection row — no shared mutable RNG state exists under jit),
    and a different seed must diverge."""
    Y = pt.SparseBernoulliGLM(4, B=2, L=4, seed=8).generate(300, keep=False)

    def chain(seed):
        m = pt.SparseBernoulliGLM(4, B=2, L=4, seed=seed)
        m.add_data(Y)
        for _ in range(3):
            m.resample_model()
        return m.A, m.W, m.bias

    A1, W1, b1 = chain(13)
    A2, W2, b2 = chain(13)
    assert np.array_equal(A1, A2) and np.array_equal(W1, W2)
    assert np.array_equal(b1, b2)
    A3, _, b3 = chain(14)
    assert not (np.array_equal(A1, A3) and np.array_equal(b1, b3))
