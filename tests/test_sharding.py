"""SPMD sharding tests on the simulated 8-device CPU mesh (SURVEY.md §4:
'multi-node without a real cluster' -> forced host platform device count)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import pyglm_tpu as pt
from pyglm_tpu.parallel.sharding import make_mesh, make_sharded_sweep
from pyglm_tpu.models.sweep import make_gibbs_sweep


requires_8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (simulated) devices")


@requires_8
def test_make_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape == {"time": 1, "neuron": 8}
    mesh2 = make_mesh(n_time=2)
    assert mesh2.shape == {"time": 2, "neuron": 4}
    mesh4 = make_mesh(n_time=4, n_neuron=2)
    assert mesh4.shape == {"time": 4, "neuron": 2}


@requires_8
@pytest.mark.parametrize("n_time,n_neuron", [(1, 8), (2, 4), (8, 1)])
def test_sharded_sweep_runs(n_time, n_neuron):
    model = pt.SparseBernoulliGLM(16, B=2, L=4, seed=0)
    model.generate(256, keep=True)
    mesh = make_mesh(n_time=n_time, n_neuron=n_neuron)
    model.shard(mesh)
    for _ in range(3):
        d = model.resample_model()
    assert np.isfinite(d["log_likelihood"])
    assert model.A.shape == (16, 16)


@requires_8
def test_sharded_matches_single_device_stats():
    """The deterministic parts (sufficient stats) must be identical whether
    computed on 1 device or sharded over 8 (bit-consistency up to f32
    reduction order)."""
    from pyglm_tpu.models.weights import sufficient_stats
    from jax.sharding import NamedSharding, PartitionSpec as P
    rng = np.random.RandomState(0)
    T, N, B = 512, 16, 2
    Pdim = N * B + 1
    Xf = jnp.asarray(rng.rand(T, Pdim), jnp.float32)
    omega = jnp.asarray(rng.rand(T, N) + 0.1, jnp.float32)
    kappa = jnp.asarray(rng.randn(T, N), jnp.float32)

    J1, h1 = sufficient_stats(Xf, omega, kappa, t_chunk=128)

    mesh = make_mesh(n_time=2, n_neuron=4)
    sh = lambda *s: NamedSharding(mesh, P(*s))
    Xs = jax.device_put(Xf, sh("time", None))
    Os = jax.device_put(omega, sh("time", "neuron"))
    Ks = jax.device_put(kappa, sh("time", "neuron"))
    J8, h8 = sufficient_stats(Xs, Os, Ks, t_chunk=128)
    np.testing.assert_allclose(np.asarray(J1), np.asarray(J8), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h8), rtol=2e-5, atol=2e-5)


@requires_8
@pytest.mark.slow
def test_sharded_chain_statistically_consistent():
    """A sharded chain must mix to the same posterior as the single-device
    chain (same data, different RNG partitioning): compare posterior mean
    log-lik after burn-in."""
    N, T = 8, 1000
    true = pt.SparseBernoulliGLM(
        N, B=2, L=4, seed=3,
        net_kwargs=dict(rho_init=0.3, learn_rho=False, sigma_w=2.0,
                        mu_bias=-1.0, learn_weight_prior=False))
    Y = true.generate(T, keep=False)

    def run(shard):
        m = pt.SparseBernoulliGLM(N, B=2, L=4, seed=11)
        m.add_data(Y)
        if shard:
            m.shard(make_mesh(n_time=2, n_neuron=4))
        lls = [m.resample_model()["log_likelihood"] for _ in range(40)]
        return np.mean(lls[20:])

    ll_single, ll_shard = run(False), run(True)
    # Same stationary distribution: post-burn-in average log-liks agree
    # within a loose MC tolerance.
    assert abs(ll_single - ll_shard) / abs(ll_single) < 0.02, (
        ll_single, ll_shard)


@requires_8
def test_gram_shard_map_matches_unsharded():
    """The shard_map Gram wrapper (Pallas per shard on TPU, XLA per shard
    here) must reproduce the unsharded group Gram blocks: local time-slice
    Grams psum to the full associative sum."""
    from pyglm_tpu.models.weights import group_gram_blocks, _gram_shard_map
    N, B, G, T = 8, 2, 2, 64
    P = N * B + 1
    rng = np.random.RandomState(0)
    Xf = jnp.asarray(rng.randn(T, P).astype(np.float32))
    omega = jnp.asarray(rng.rand(T, N).astype(np.float32) + 0.1)
    mesh = make_mesh(n_time=2, n_neuron=4)
    J_ref = group_gram_blocks(Xf, omega, B, G, t_chunk=16,
                              precision="highest")
    J_sm = _gram_shard_map(Xf, omega, B, G, 16, "highest", mesh,
                           use_pallas=False)
    np.testing.assert_allclose(np.asarray(J_sm), np.asarray(J_ref),
                               rtol=2e-5, atol=2e-5)


@requires_8
def test_pg_shard_map_distribution():
    """pg_draw_unit under an active mesh routes through jax.shard_map; the
    per-shard draws must still be exact PG(1, c) (KS vs the plain path)."""
    from pyglm_tpu.ops.polyagamma import pg_draw_unit, pg_devroye
    from pyglm_tpu.parallel.sharding import (
        make_mesh, set_active_mesh, active_mesh)
    from pyglm_tpu.diagnostics.geweke import ks_two_sample
    c = jnp.full((2048, 8), 1.3, jnp.float32)
    mesh = make_mesh(n_time=2, n_neuron=4)
    prev = active_mesh()
    set_active_mesh(mesh)
    try:
        s_mesh = pg_draw_unit(jax.random.key(0), c)
    finally:
        set_active_mesh(prev)
    assert s_mesh.shape == c.shape
    s_ref = pg_devroye(jax.random.key(1), c)
    ks, thr = ks_two_sample(s_mesh, s_ref)
    assert ks < thr, (ks, thr)


@requires_8
def test_gamma_shard_map_distribution():
    """Same for the PG(b, c) gamma-series dispatch under a mesh."""
    from pyglm_tpu.ops.polyagamma import polya_gamma, pg_gamma_series
    from pyglm_tpu.parallel.sharding import (
        make_mesh, set_active_mesh, active_mesh)
    from pyglm_tpu.diagnostics.geweke import ks_two_sample
    b = jnp.full((2048, 8), 3.5, jnp.float32)
    c = jnp.full((2048, 8), 0.8, jnp.float32)
    mesh = make_mesh(n_time=2, n_neuron=4)
    prev = active_mesh()
    set_active_mesh(mesh)
    try:
        s_mesh = polya_gamma(jax.random.key(0), b, c, method="real")
    finally:
        set_active_mesh(prev)
    s_ref = pg_gamma_series(jax.random.key(1), b, c)
    ks, thr = ks_two_sample(s_mesh, s_ref)
    assert ks < thr, (ks, thr)
