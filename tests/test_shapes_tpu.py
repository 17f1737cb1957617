"""Model-level TPU smoke across dispatch-gate edge shapes.

The spike-and-slab dispatcher (models/weights.py _tspace_impl) picks
between the monolithic fused Pallas kernel, the staged Pallas-Gram path,
and the XLA fallback based on shape gates (GB % 8, B <= 8, T >= 384,
VMEM cap). Each case below pins one gate boundary ON REAL TPU — the CPU
suite cannot catch Mosaic-lowering or padding bugs in these branches.

  B=1   -> the bias-row/N_pre counting fix (advisor r2 low) on the fused
           kernel (G=8, GB=8)
  B=2   -> GB=8 via G=4
  B=8   -> the B <= 8 ceiling (G=1) at T=400, just above the T >= 384 gate
  B=3   -> no aligned G exists: the staged/XLA fallback must engage
  N=136 -> npad=256 with 120 dead lanes (partial tile masking)
"""
import os

import numpy as np
import pytest

if not os.environ.get("PYGLM_TEST_TPU"):
    pytest.skip("TPU-only lane (set PYGLM_TEST_TPU=1)",
                allow_module_level=True)

import pyglm_tpu as pt


@pytest.mark.parametrize("N,B,T,precision", [
    (16, 1, 1000, "high"),
    (16, 2, 700, "default"),
    (8, 8, 400, "high"),
    (12, 3, 800, "high"),
    (136, 4, 1000, "sr"),
])
def test_model_sweeps_at_gate_boundaries(N, B, T, precision):
    true = pt.SparseBernoulliGLM(
        N, B=B, L=max(B, 5), seed=7,
        net_kwargs=dict(rho_init=0.25, learn_rho=False, mu_bias=-2.0))
    Y = true.generate(T, keep=False)
    m = pt.SparseBernoulliGLM(N, B=B, L=max(B, 5), seed=0,
                              precision=precision)
    m.add_data(Y)
    lls = []
    for _ in range(4):
        d = m.resample_model()
        lls.append(float(d["log_likelihood"]))
    assert np.all(np.isfinite(lls)), lls
    A, W, b = np.asarray(m.A), np.asarray(m.W_effective), np.asarray(m.bias)
    assert A.shape == (N, N) and set(np.unique(A)) <= {0.0, 1.0}
    assert np.isfinite(W).all() and np.isfinite(b).all()
    # the chain must move and stay sane (not a frozen/NaN-masked state)
    assert lls[-1] > lls[0] - 200.0
