"""Demo: generate -> fit -> evaluate a sparse Bernoulli network GLM.

Mirrors the reference's examples/ workflow (SURVEY.md §3.5): build a
ground-truth model, simulate spikes, fit a fresh model by Gibbs, compare
the inferred network to the truth. Run: python examples/synthetic_bernoulli.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # zero-install run

import numpy as np

import pyglm_tpu as pt
from pyglm_tpu.utils.metrics import link_auc

N, B, L, T = 27, 4, 10, 60_000

true = pt.SparseBernoulliGLM(
    N, B=B, L=L, seed=42,
    net_kwargs=dict(rho_init=0.15, learn_rho=False, mu_bias=-2.5,
                    sigma_bias=0.25, learn_weight_prior=False, sigma_w=1.0))
Y = true.generate(T, keep=False)
print(f"generated {Y.shape} spikes, rate={Y.mean():.3f}, "
      f"true edges={int(true.A.sum())}")

model = pt.SparseBernoulliGLM(N, B=B, L=L, seed=0)
model.add_data(Y)
samples = model.fit(n_samples=100, n_burnin=100, verbose=True)

A_mean = samples["A"].mean(0)
auc = link_auc(A_mean, true.A)
W_eff = (samples["A"][..., None] * samples["W"]).sum(-1).mean(0)
mask = true.A.astype(bool)
corr = np.corrcoef(W_eff[mask], true.W_effective[mask])[0, 1]
print(f"link AUC = {auc:.3f}; active-edge weight corr = {corr:.3f}")
print(f"final log-likelihood = {samples['lls'][-1]:.1f}")
