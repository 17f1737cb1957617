import os
import numpy as np
import pytest

import pyglm_tpu as pt
from pyglm_tpu.utils.checkpoint import save_state, load_state
from pyglm_tpu.utils.metrics import link_auc, predictive_log_likelihood, bits_per_spike


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path):
    m = pt.SparseBernoulliGLM(5, B=2, L=4, seed=0)
    m.generate(300, keep=True)
    for _ in range(3):
        m.resample_model()
    path = str(tmp_path / "state.npz")
    save_state(path, m)
    A0, W0, b0 = m.A.copy(), m.W.copy(), m.bias.copy()

    # Continue the chain two ways: live vs save->load->resume. Identical
    # config + restored key => identical trajectories.
    m2 = pt.SparseBernoulliGLM(5, B=2, L=4, seed=99)
    m2.add_data(np.asarray(m.datas[0].Y))
    load_state(path, m2)
    np.testing.assert_array_equal(m2.A, A0)
    np.testing.assert_array_equal(m2.bias, b0)

    d1 = m.resample_model()
    d2 = m2.resample_model()
    assert d1["log_likelihood"] == d2["log_likelihood"]
    np.testing.assert_array_equal(m.A, m2.A)


def test_link_auc():
    A = np.zeros((4, 4)); A[0, 1] = A[2, 3] = 1
    scores = A * 0.9 + 0.05
    assert link_auc(scores, A) == 1.0
    assert abs(link_auc(np.random.RandomState(0).rand(50, 50),
                        np.random.RandomState(1).rand(50, 50) < 0.3) - 0.5) < 0.05


@pytest.mark.slow
def test_predictive_ll_and_bits_per_spike():
    true = pt.SparseBernoulliGLM(4, B=2, L=4, seed=1,
                                 net_kwargs=dict(rho_init=0.4, sigma_w=1.5,
                                                 mu_bias=-1.5))
    Y = true.generate(2000, keep=False)
    Y_train, Y_test = Y[:1500], Y[1500:]
    m = pt.SparseBernoulliGLM(4, B=2, L=4, seed=2)
    m.add_data(Y_train)
    for _ in range(20):
        m.resample_model()
    pll, lls = predictive_log_likelihood(m, Y_test, n_samples=5, thin=2)
    assert np.isfinite(pll) and len(lls) == 5
    bps = bits_per_spike(pll, Y_test)
    assert np.isfinite(bps)


def test_split_rhat_converged_vs_divergent():
    from pyglm_tpu.utils.metrics import split_rhat
    rng = np.random.RandomState(0)
    # 4 iid-normal chains over a (3, 2) quantity: R-hat ~ 1.
    good = rng.randn(4, 400, 3, 2)
    r = split_rhat(good)
    assert r.shape == (3, 2)
    assert np.all(r < 1.05), r
    # separate the chain means: R-hat must blow past 1.3.
    bad = good + np.arange(4)[:, None, None, None] * 3.0
    assert np.all(split_rhat(bad) > 1.3)
    # globally-constant component stays defined (1.0), not NaN.
    const = np.concatenate([good, np.zeros((4, 400, 3, 1))], axis=-1)
    r2 = split_rhat(const)
    assert np.all(np.isfinite(r2)) and r2[0, -1] == 1.0
    # constant WITHIN chains but different ACROSS them (frozen inclusion
    # indicator in a multimodal posterior) must flag divergence, not 1.0.
    stuck = np.zeros((4, 400, 1))
    stuck[2:] = 1.0
    assert np.isinf(split_rhat(stuck)[0])


def test_ess_per_chain_ar1():
    from pyglm_tpu.utils.metrics import ess_per_chain
    rng = np.random.RandomState(1)
    n = 20000
    # iid: ESS ~ n.
    assert ess_per_chain(rng.randn(n)) > 0.8 * n
    # AR(1), rho = 0.9: ESS/n -> (1-rho)/(1+rho) ~ 0.0526.
    rho = 0.9
    x = np.empty(n)
    x[0] = rng.randn()
    eps = rng.randn(n) * np.sqrt(1 - rho ** 2)
    for t in range(1, n):
        x[t] = rho * x[t - 1] + eps[t]
    ratio = ess_per_chain(x) / n
    assert 0.03 < ratio < 0.08, ratio
