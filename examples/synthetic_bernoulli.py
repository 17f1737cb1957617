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

# --- figures: the reference demos' actual deliverable (SURVEY.md §3.5:
# generate -> fit -> PLOT true-vs-inferred weights and rates) -------------
try:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
except ImportError:
    print("matplotlib unavailable; skipping figures")
    sys.exit(0)

fig, axes = plt.subplots(2, 2, figsize=(10, 9))
vmax = float(np.abs(true.W_effective).max())
im = axes[0, 0].imshow(true.W_effective, cmap="RdBu_r", vmin=-vmax, vmax=vmax)
axes[0, 0].set_title("true $\\sum_b A W$")
axes[0, 1].imshow(W_eff, cmap="RdBu_r", vmin=-vmax, vmax=vmax)
axes[0, 1].set_title("posterior mean $\\sum_b A W$")
fig.colorbar(im, ax=axes[0, :2], shrink=0.8, label="net synaptic weight")
for ax in axes[0]:
    ax.set_xlabel("postsynaptic n")
    ax.set_ylabel("presynaptic j")

# conditional mean rates on a window of the training data, truth vs fit
t0, t1 = 500, 1000
rates_fit = model.means[0][t0:t1]
true.add_data(Y)
rates_true = true.means[0][t0:t1]
n_show = 3
for n in range(n_show):
    axes[1, 0].plot(np.arange(t0, t1), rates_true[:, n] + 0.5 * n,
                    "k-", lw=0.8, label="true" if n == 0 else None)
    axes[1, 0].plot(np.arange(t0, t1), rates_fit[:, n] + 0.5 * n,
                    "r-", lw=0.8, alpha=0.7,
                    label="inferred" if n == 0 else None)
axes[1, 0].set_title(f"conditional mean rate, neurons 0..{n_show-1} (offset)")
axes[1, 0].set_xlabel("time bin")
axes[1, 0].legend(loc="upper right")

axes[1, 1].plot(samples["lls"])
axes[1, 1].set_title("log-likelihood trace (post-burn-in samples)")
axes[1, 1].set_xlabel("sample")

out = os.path.join(os.path.dirname(__file__), "synthetic_bernoulli.png")
fig.savefig(out, dpi=120, bbox_inches="tight")
print(f"wrote {out}")
