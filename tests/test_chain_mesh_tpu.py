"""Chain-mesh paths on real TPU: Pallas kernels inside shard_map bodies.

The chain-axis ensemble/tempering sweeps run their per-device bodies under
jax.shard_map with the single-chip fused kernels enabled
(parallel.sharding.local_spmd). This box has ONE chip, so the mesh is
{'chain': 1} — what this lane validates is the COMPOSITION that no other
suite executes on hardware: pallas_call (fused spike-and-slab, PG Devroye,
gamma-series) traced and run inside a shard_map body on the chip, plus the
swap exchange on sharded state. Multi-device chain meshes are validated
statistically on the simulated CPU mesh (tests/test_chain_mesh.py).

Runs only with PYGLM_TEST_TPU=1, like the other TPU kernel suites.
"""
import os

import numpy as np
import pytest

if not os.environ.get("PYGLM_TEST_TPU"):
    pytest.skip("TPU-only lane (set PYGLM_TEST_TPU=1)",
                allow_module_level=True)

import pyglm_tpu as pt
from pyglm_tpu.parallel.sharding import make_chain_mesh


def _model(seed=0, **okw):
    # Fused-eligible shape: N=8, B=4 -> GB=32 (%8==0), T>=384.
    return pt.SparseBernoulliGLM(
        8, B=4, L=10, seed=seed,
        net_kwargs=dict(rho_init=0.3, learn_rho=False, mu_bias=-1.5,
                        sigma_bias=0.3, sigma_w=0.4,
                        learn_weight_prior=False), **okw)


def test_ensemble_chain_mesh_fused_on_chip():
    import pyglm_tpu.models.weights as weights_mod
    m = _model(precision="high")
    m.generate(512, keep=True)
    weights_mod.LAST_SS_PATH = None
    out = m.fit_ensemble(n_chains=2, n_samples=10, n_burnin=5,
                         mesh=make_chain_mesh(1))
    # The fused Pallas kernel must have compiled INSIDE the shard_map body
    # (local_spmd makes it eligible there).
    assert weights_mod.LAST_SS_PATH == "fused", weights_mod.LAST_SS_PATH
    assert out["A"].shape == (2, 10, 8, 8)
    assert np.isfinite(out["lls"]).all()
    assert not np.allclose(out["lls"][0], out["lls"][1])


def test_tempered_chain_mesh_on_chip():
    import pyglm_tpu.models.weights as weights_mod
    m = _model(precision="high")
    m.generate(512, keep=True)
    weights_mod.LAST_SS_PATH = None
    out = m.fit_tempered(n_samples=10, n_burnin=5,
                         betas=np.linspace(0.98, 1.0, 4),
                         mesh=make_chain_mesh(1))
    assert weights_mod.LAST_SS_PATH == "fused", weights_mod.LAST_SS_PATH
    assert out["A"].shape == (10, 8, 8)
    assert np.isfinite(out["lls"]).all()
    # tight ladder on 512 obs: interior rungs must actually swap
    assert out["swap_rate"][1:-1].mean() > 0.05, out["swap_rate"]
