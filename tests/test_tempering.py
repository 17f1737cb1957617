"""Parallel-tempering machinery (models/tempering.py): swap-move
correctness and cold-chain exactness. The config-5 scale experiment lives
in benchmarks/config5_pt.py; BASELINE.md records its verdict."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import pyglm_tpu as pt
from pyglm_tpu.models.tempering import (init_tempered_states,
                                        make_tempered_sweep,
                                        swap_permutation, suggest_ladder)


def test_swap_permutation_is_valid_permutation():
    betas = jnp.asarray([0.4, 0.7, 0.9, 1.0])
    for s in range(20):
        lls = jnp.asarray(np.random.RandomState(s).randn(4) * 5)
        perm, acc, parity = swap_permutation(jax.random.key(s), lls, betas)
        p = np.asarray(perm)
        assert sorted(p.tolist()) == [0, 1, 2, 3]
        # adjacent transpositions only, and an involution
        assert np.all(np.abs(p - np.arange(4)) <= 1)
        assert np.array_equal(p[p], np.arange(4))


def test_swap_permutation_accepts_and_rejects_correctly():
    """Favorable swaps (hot chain holds the higher likelihood) always
    accept; strongly unfavorable ones never do."""
    betas = jnp.asarray([0.5, 1.0])
    n_sw_fav = n_par0 = n_sw_unfav = 0
    for s in range(400):
        perm_f, _, par = swap_permutation(
            jax.random.key(s), jnp.asarray([50.0, -50.0]), betas)
        perm_u, _, _ = swap_permutation(
            jax.random.key(s), jnp.asarray([-50.0, 50.0]), betas)
        if int(par) == 0:
            n_par0 += 1
            n_sw_fav += int(np.asarray(perm_f)[0] == 1)
        n_sw_unfav += int(np.asarray(perm_u)[0] == 1)
    # parity 0 pairs (0,1); log_alpha = (1-0.5)*(ll_0-ll_1) = +50 or -50
    assert n_par0 > 150
    assert n_sw_fav == n_par0          # always accepted when favorable
    assert n_sw_unfav == 0             # never when unfavorable


def test_suggest_ladder_feasibility():
    betas, span = suggest_ladder(sd_ll=200.0, C=8, accept=0.3)
    assert betas[-1] == 1.0 and np.all(np.diff(betas) > 0)
    # sd(ll) = 200 forces tiny rung gaps: the 8-rung ladder spans ~1% of
    # the unit interval — the feasibility wall the config-5 study measures
    assert span < 0.1, span
    betas2, span2 = suggest_ladder(sd_ll=2.0, C=8, accept=0.3)
    assert span2 > 1.0


def test_tempered_ladder_sweeps_run():
    """A 3-rung ladder on a latent-distance spike-and-slab model: sweeps
    produce finite untempered lls for every rung and swap diagnostics."""
    N, T = 8, 256
    model = pt.NonlinearAutoregressiveModel(
        N, B=2, L=4, observation="bernoulli", network="latent_distance",
        spike_and_slab=True, seed=0, net_kwargs=dict(dim=2, mu_bias=-1.5))
    model.generate(T, keep=True)
    betas = [0.5, 0.8, 1.0]
    sweep = jax.jit(make_tempered_sweep(
        model.observation, model.network, N, model.B, betas,
        spike_slab=True, precision="highest"))
    st = init_tempered_states(model, betas)
    key = jax.random.key(0)
    accs = []
    for i in range(6):
        key, k = jax.random.split(key)
        st, diag = sweep(k, st, tuple(model.datas))
        assert np.all(np.isfinite(np.asarray(diag["log_likelihood"])))
        accs.append(np.asarray(diag["swap_accept"]))
    assert st.A.shape == (3, N, N)
    accs = np.stack(accs)
    assert np.all((accs == 0) | (accs == 1))


@pytest.mark.slow
def test_tempered_cold_chain_matches_plain_chain():
    """With a flat ladder (all betas = 1) every rung is the exact sampler
    and swaps always accept (log alpha = 0): the cold rung's posterior must
    match a plain single-chain run on the same data — validates that the
    tempered PG path (PG(beta=1, psi) via the gamma-series kernel) and the
    swap plumbing leave the stationary distribution intact."""
    N, T, S, BURN = 8, 512, 300, 100
    true = pt.SparseBernoulliGLM(
        N, B=2, L=4, seed=3,
        net_kwargs=dict(rho_init=0.3, learn_rho=False, sigma_w=1.0,
                        mu_bias=-1.0, learn_weight_prior=False))
    Y = true.generate(T, keep=False)

    # plain chain
    m = pt.SparseBernoulliGLM(
        N, B=2, L=4, seed=11,
        net_kwargs=dict(rho_init=0.3, learn_rho=False, sigma_w=1.0,
                        mu_bias=-1.0, learn_weight_prior=False))
    m.add_data(Y)
    A1 = np.zeros((N, N)); b1 = 0.0; n1 = 0
    for i in range(S):
        m.resample_model()
        if i >= BURN:
            A1 += m.A; b1 += m.bias.mean(); n1 += 1
    A1 /= n1; b1 /= n1

    # 2-rung flat ladder, cold chain = rung 1
    betas = [1.0, 1.0]
    sweep = jax.jit(make_tempered_sweep(
        m.observation, m.network, N, m.B, betas, spike_slab=True,
        precision="highest"))
    st = init_tempered_states(m, betas)
    key = jax.random.key(42)
    A2 = np.zeros((N, N)); b2 = 0.0; n2 = 0
    for i in range(S):
        key, k = jax.random.split(key)
        st, diag = sweep(k, st, tuple(m.datas))
        if i >= BURN:
            A2 += np.asarray(st.A[1]); b2 += float(np.mean(st.b[1])); n2 += 1
    A2 /= n2; b2 /= n2

    assert abs(A1.mean() - A2.mean()) < 0.05, (A1.mean(), A2.mean())
    assert np.abs(A1 - A2).mean() < 0.12, np.abs(A1 - A2).mean()
    assert abs(b1 - b2) < 0.3, (b1, b2)
