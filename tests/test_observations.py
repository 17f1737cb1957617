import numpy as np
import jax
import pytest
import jax.numpy as jnp
from scipy import stats as sps

from pyglm_tpu.models.observations import (
    Bernoulli, Binomial, NegativeBinomial, Gaussian, make_observation,
)


def test_bernoulli_loglik_matches_scipy():
    fam = Bernoulli()
    Y = jnp.asarray([[0.0, 1.0], [1.0, 0.0]])
    psi = jnp.asarray([[0.3, -1.2], [2.0, 0.0]])
    ll = np.asarray(fam.log_likelihood(Y, psi, None))
    p = 1 / (1 + np.exp(-np.asarray(psi)))
    ll_ref = sps.bernoulli.logpmf(np.asarray(Y).astype(int), p)
    np.testing.assert_allclose(ll, ll_ref, rtol=1e-5)


def test_binomial_loglik_and_sample():
    fam = Binomial(n_trials=7)
    Y = jnp.asarray([[3.0, 0.0], [7.0, 5.0]])
    psi = jnp.asarray([[0.5, -0.5], [1.0, 0.1]])
    ll = np.asarray(fam.log_likelihood(Y, psi, None))
    p = 1 / (1 + np.exp(-np.asarray(psi)))
    ll_ref = sps.binom.logpmf(np.asarray(Y).astype(int), 7, p)
    np.testing.assert_allclose(ll, ll_ref, rtol=1e-4)
    samples = np.asarray(fam.sample(jax.random.key(0),
                                    jnp.full((20000, 1), 0.4), None))
    np.testing.assert_allclose(samples.mean(), 7 / (1 + np.exp(-0.4)), rtol=0.02)


def test_negative_binomial_loglik_and_sample():
    fam = NegativeBinomial(r_init=3.5, max_y=64)
    aux = fam.init_aux(2)
    Y = jnp.asarray([[0.0, 2.0], [5.0, 1.0]])
    psi = jnp.asarray([[-1.0, 0.2], [0.5, -0.3]])
    ll = np.asarray(fam.log_likelihood(Y, psi, aux))
    p = 1 / (1 + np.exp(-np.asarray(psi)))
    # scipy NB: pmf(k; n, q) with success prob q = 1-p in our parametrization
    ll_ref = sps.nbinom.logpmf(np.asarray(Y).astype(int), 3.5, 1 - p)
    np.testing.assert_allclose(ll, ll_ref, rtol=1e-4)
    samples = np.asarray(fam.sample(jax.random.key(1),
                                    jnp.full((20000, 2), -0.5), aux))
    np.testing.assert_allclose(samples.mean(), 3.5 * np.exp(-0.5), rtol=0.05)


def test_nb_pg_b_and_kappa():
    fam = NegativeBinomial(r_init=2.0, max_y=16)
    aux = fam.init_aux(2)
    Y = jnp.asarray([[0.0, 3.0]])
    psi = jnp.zeros((1, 2))
    omega, kappa = fam.omega_kappa(jax.random.key(0), Y, psi, aux)
    np.testing.assert_allclose(np.asarray(kappa), [[-1.0, 0.5]])
    assert np.all(np.asarray(omega) > 0)


@pytest.mark.slow
def test_nb_collapsed_crt_matches_elementwise():
    """The cached-count collapsed CRT (sum_i Binomial(#{y>i}, r/(r+i)))
    must match the per-element CRT kernel in distribution — it is the same
    set of independent Bernoullis regrouped by table index, so the r draw's
    marginal is identical. KS-compared per neuron."""
    from scipy.stats import ks_2samp
    fam = NegativeBinomial(max_y=8)
    rng = np.random.RandomState(0)
    T, N = 300, 2
    Y = jnp.asarray(np.minimum(rng.negative_binomial(4, 0.5, (T, N)), 8),
                    jnp.float32)
    psi = jnp.asarray(rng.randn(T, N) * 0.3, jnp.float32)
    aux = {"r": jnp.asarray([2.0, 5.5], jnp.float32)}
    cache = fam.ll_cache(Y)
    REP = 1500

    def draw(path_cache, seed0):
        f = jax.jit(lambda k: fam.resample_aux(
            k, aux, Y, psi, cache=path_cache)["r"])
        ks = jax.random.split(jax.random.key(seed0), REP)
        return np.stack([np.asarray(f(k)) for k in ks])

    a, b = draw(None, 1), draw(cache, 2)
    for n in range(N):
        s, p = ks_2samp(a[:, n], b[:, n])
        assert p > 1e-3, (n, s, p)


@pytest.mark.slow
def test_nb_r_resample_concentrates():
    """With lots of data at psi=0, resampled r should be near mean counts."""
    fam = NegativeBinomial(r_init=4.0, max_y=128)
    aux = fam.init_aux(1)
    key = jax.random.key(2)
    psi = jnp.zeros((20000, 1))
    Y = fam.sample(key, psi, {"r": jnp.asarray([6.0])})
    rs = []
    for i in range(20):
        aux = fam.resample_aux(jax.random.fold_in(key, i), aux, Y, psi)
        rs.append(float(aux["r"][0]))
    assert abs(np.mean(rs[5:]) - 6.0) < 1.0, rs


def test_gaussian_loglik_and_eta_resample():
    fam = Gaussian(eta_init=1.0)
    aux = {"eta": jnp.asarray([0.5, 2.0])}
    Y = jnp.asarray([[0.1, -0.3]])
    psi = jnp.asarray([[0.0, 0.5]])
    ll = np.asarray(fam.log_likelihood(Y, psi, aux))
    ll_ref = sps.norm.logpdf(np.asarray(Y), np.asarray(psi),
                             np.sqrt(np.array([0.5, 2.0])))
    np.testing.assert_allclose(ll, ll_ref, rtol=1e-5)
    # eta posterior concentrates on true residual variance
    rng = np.random.RandomState(0)
    Yb = jnp.asarray(rng.randn(50000, 2) * np.sqrt([0.7, 3.0]), jnp.float32)
    psib = jnp.zeros((50000, 2))
    new = fam.resample_aux(jax.random.key(3), aux, Yb, psib)
    np.testing.assert_allclose(np.asarray(new["eta"]), [0.7, 3.0], rtol=0.05)


def test_gaussian_omega_is_inverse_eta():
    fam = Gaussian()
    aux = {"eta": jnp.asarray([0.25])}
    Y = jnp.asarray([[2.0], [4.0]])
    omega, kappa = fam.omega_kappa(jax.random.key(0), Y, jnp.zeros_like(Y), aux)
    np.testing.assert_allclose(np.asarray(omega), 4.0)
    np.testing.assert_allclose(np.asarray(kappa), np.asarray(Y) * 4.0)


def test_ll_cache_sum_matches_elementwise():
    """log_likelihood_sum with the precomputed psi-independent cache must
    equal the elementwise total (the cached form is an exact regrouping of
    the same sum — only fp summation order differs)."""
    rng = np.random.RandomState(7)
    psi = jnp.asarray(rng.randn(300, 5) * 0.8, jnp.float32)

    nb = NegativeBinomial(r_init=2.3, max_y=32)
    aux = {"r": jnp.asarray(rng.uniform(0.5, 6.0, 5), jnp.float32)}
    Y = jnp.asarray(rng.poisson(3.0, (300, 5)).clip(max=32), jnp.float32)
    cache = nb.ll_cache(Y)
    assert cache["counts"].shape == (33, 5)
    np.testing.assert_allclose(np.asarray(cache["counts"]).sum(axis=0), 300)
    want = float(jnp.sum(nb.log_likelihood(Y, psi, aux)))
    got = float(nb.log_likelihood_sum(Y, psi, aux, cache))
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # no cache -> identical fallback
    np.testing.assert_allclose(
        float(nb.log_likelihood_sum(Y, psi, aux)), want, rtol=1e-6)

    bi = Binomial(n_trials=9)
    Yb = jnp.asarray(rng.binomial(9, 0.3, (300, 5)), jnp.float32)
    cacheb = bi.ll_cache(Yb)
    wantb = float(jnp.sum(bi.log_likelihood(Yb, psi, None)))
    gotb = float(bi.log_likelihood_sum(Yb, psi, None, cacheb))
    np.testing.assert_allclose(gotb, wantb, rtol=1e-5)

    # families without cacheable structure opt out
    assert Bernoulli().ll_cache(Y) is None
    assert Gaussian().ll_cache(Y) is None


def test_sweep_ll_diag_uses_cache_consistently():
    """The sweep's log_likelihood diagnostic must agree between a dataset
    registered through add_data (cache present) and a bare GLMData (cache
    absent), at the same state and key. resample_r=False isolates the LL
    regrouping: with r resampling ON the cache also switches the r update
    to the collapsed-CRT sampler, which is equal in DISTRIBUTION but not
    bitwise at a shared key (test_nb_collapsed_crt_matches_elementwise
    covers that equivalence)."""
    import pyglm_tpu as pt
    from pyglm_tpu.models.sweep import GLMData

    m = pt.SparseNegativeBinomialGLM(4, B=2, L=5, seed=0,
                                     obs_kwargs=dict(max_y=16,
                                                     resample_r=False))
    Y = np.minimum(np.random.RandomState(0).poisson(1.0, (400, 4)), 15)
    m.add_data(Y)
    assert m.datas[0].llc is not None
    key = jax.random.key(123)
    _, d_cached = m._sweep(key, m.state, tuple(m.datas))
    bare = (GLMData(Y=m.datas[0].Y, Xf=m.datas[0].Xf, Xt=m.datas[0].Xt),)
    _, d_bare = m._sweep(key, m.state, bare)
    np.testing.assert_allclose(float(d_cached["log_likelihood"]),
                               float(d_bare["log_likelihood"]), rtol=1e-5)


def test_make_observation_dispatch():
    assert make_observation("bernoulli").name == "bernoulli"
    assert make_observation("nb").name == "negative_binomial"
    assert make_observation("binomial", n_trials=3).n_trials == 3
    assert make_observation("gaussian").name == "gaussian"
