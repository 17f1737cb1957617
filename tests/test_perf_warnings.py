"""Silent performance downgrades must be loud (VERDICT r3 weak #3 / next
item #5): a sharded model that quietly ingests unsharded, or a mesh sweep
that quietly bypasses the fused spike-and-slab path, emits a
PerformanceWarning. Correctness is unaffected either way — these tests pin
the *warning*, and that clean configurations stay silent."""
import warnings

import numpy as np
import jax
import pytest

import pyglm_tpu as pt
from pyglm_tpu.parallel.sharding import make_mesh
from pyglm_tpu.utils.utils import PerformanceWarning

requires_8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (simulated) devices")


def _model(T, seed=0):
    m = pt.SparseBernoulliGLM(16, B=2, L=4, seed=seed)
    m.generate(T, keep=True)
    return m


@requires_8
def test_shard_warns_on_indivisible_T():
    m = _model(257)                       # 257 % 2 != 0
    with pytest.warns(PerformanceWarning, match="UNSHARDED design"):
        m.shard(make_mesh(n_time=2, n_neuron=4))


@requires_8
def test_shard_warns_on_short_time_shard():
    m = _model(8)                         # 8 // 8 = 1 < L = 4
    with pytest.warns(PerformanceWarning, match="at least L=4 bins"):
        m.shard(make_mesh(n_time=8, n_neuron=1))


@requires_8
def test_add_data_after_shard_warns_on_bad_T():
    m = _model(256)
    m.shard(make_mesh(n_time=2, n_neuron=4))
    Y2 = m.generate(129, keep=False)      # 129 % 2 != 0
    with pytest.warns(PerformanceWarning, match="ingests UNSHARDED"):
        m.add_data(Y2)


@requires_8
def test_mesh_sweep_staged_fallback_warns():
    """A mesh sweep whose dataset T defeats the fused shard_map path warns
    at trace time that the staged path is running."""
    m = _model(257)
    with pytest.warns(PerformanceWarning):
        m.shard(make_mesh(n_time=2, n_neuron=4))
    with pytest.warns(PerformanceWarning,
                      match="bypassing the fused spike-and-slab"):
        d = m.resample_model()
    assert np.isfinite(d["log_likelihood"])   # still exact, just slower


@requires_8
def test_clean_shard_is_silent():
    """Divisible T, long-enough shards: no PerformanceWarning anywhere in
    shard(), add_data(), or the first mesh sweep."""
    m = _model(256)
    with warnings.catch_warnings():
        warnings.simplefilter("error", PerformanceWarning)
        m.shard(make_mesh(n_time=2, n_neuron=4))
        m.add_data(m.generate(128, keep=False))
        m.shard(m._mesh)      # re-target over both datasets
        d = m.resample_model()
    assert np.isfinite(d["log_likelihood"])
