"""Demo: multi-chain convergence diagnostics with fit_ensemble + split-R̂.

The reference leaves convergence assessment to the user's own MCMC loop
(SURVEY.md §3.5 — a flat resample_model() loop with no tooling). Here the
canonical multi-chain check is one call: several independent chains from
overdispersed (prior) starts, split-R̂ over every marginal, ESS of the
log-likelihood trace. Run: python examples/convergence_diagnostics.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # zero-install run

import numpy as np

import pyglm_tpu as pt
from pyglm_tpu.utils.metrics import ess_per_chain, link_auc

N, B, L, T = 20, 4, 10, 20_000

true = pt.SparseBernoulliGLM(
    N, B=B, L=L, seed=7,
    net_kwargs=dict(rho_init=0.2, learn_rho=False, mu_bias=-2.5,
                    sigma_bias=0.25, learn_weight_prior=False, sigma_w=1.0))
Y = true.generate(T, keep=False)
print(f"generated {Y.shape} spikes, rate={Y.mean():.3f}")

model = pt.SparseBernoulliGLM(N, B=B, L=L, seed=0)
model.add_data(Y)

out = model.fit_ensemble(n_chains=4, n_samples=150, n_burnin=100)

print(f"split-R-hat  edges: max={out['rhat_edge'].max():.3f} "
      f"(frac > 1.1: {(out['rhat_edge'] > 1.1).mean():.3f})")
print(f"split-R-hat  bias:  max={out['rhat_bias'].max():.3f}")
print(f"split-R-hat  loglik: {out['rhat_ll']:.3f}")
ess = [ess_per_chain(out["lls"][c]) for c in range(out["lls"].shape[0])]
print(f"ESS(loglik) per chain: {np.round(ess, 1)} of {out['lls'].shape[1]}")

# pooled posterior across converged chains
A_mean = out["A"].reshape(-1, N, N).mean(0)
print(f"pooled link AUC vs truth: {link_auc(A_mean, true.A):.3f}")

# --- figures: R-hat / ESS at a glance (VERDICT r4 next #8) ----------------
try:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
except ImportError:
    print("matplotlib unavailable; skipping figures")
    sys.exit(0)

fig, axes = plt.subplots(2, 2, figsize=(10, 8))

# per-chain log-likelihood traces: overdispersed starts funneling together
for c in range(out["lls"].shape[0]):
    axes[0, 0].plot(out["lls"][c], lw=0.8, label=f"chain {c}")
axes[0, 0].set_title("log-likelihood traces (4 prior-initialized chains)")
axes[0, 0].set_xlabel("post-burn-in sample")
axes[0, 0].legend(loc="lower right", fontsize=8)

# split-R-hat distribution over the edge marginals
axes[0, 1].hist(out["rhat_edge"].ravel(), bins=40)
axes[0, 1].axvline(1.1, color="r", ls="--", lw=1, label="1.1 threshold")
axes[0, 1].set_title("split-$\\hat R$ over edge marginals $A_{jn}$")
axes[0, 1].set_xlabel("$\\hat R$")
axes[0, 1].legend()

# per-neuron bias R-hat
axes[1, 0].plot(np.sort(out["rhat_bias"]), "o-", ms=3)
axes[1, 0].axhline(1.1, color="r", ls="--", lw=1)
axes[1, 0].set_title("split-$\\hat R$ per bias (sorted)")
axes[1, 0].set_xlabel("neuron (sorted)")
axes[1, 0].set_ylabel("$\\hat R$")

# ESS of the loglik trace per chain
axes[1, 1].bar(np.arange(len(ess)), ess)
axes[1, 1].axhline(out["lls"].shape[1], color="k", ls=":", lw=1,
                   label="chain length (iid bound)")
axes[1, 1].set_title("ESS(loglik) per chain")
axes[1, 1].set_xlabel("chain")
axes[1, 1].legend()

out_png = os.path.join(os.path.dirname(__file__),
                       "convergence_diagnostics.png")
fig.savefig(out_png, dpi=120, bbox_inches="tight")
print(f"wrote {out_png}")
