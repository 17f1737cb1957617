"""Demo: stochastic-block-model network prior with latent block assignment
resampling (BASELINE config 4: N=100, K=5)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # zero-install run

import numpy as np

import pyglm_tpu as pt

N, K = 100, 5
true = pt.NonlinearAutoregressiveModel(
    N, B=4, L=10, observation="bernoulli", network="sbm",
    spike_and_slab=True, seed=3,
    net_kwargs=dict(K=K, rho_init=0.15, mu_bias=-2.5))
Y = true.generate(20_000, keep=False)

model = pt.NonlinearAutoregressiveModel(
    N, B=4, L=10, observation="bernoulli", network="sbm",
    spike_and_slab=True, seed=0, net_kwargs=dict(K=K))
model.add_data(Y)
A_mean = np.zeros((N, N))
n_avg = 0
for it in range(150):
    d = model.resample_model()
    if it >= 50:
        A_mean += model.A
        n_avg += 1
    if it % 10 == 0:
        c = np.asarray(model.state.net.c)
        occ = np.bincount(c, minlength=K)
        print(f"iter {it}: ll={d['log_likelihood']:.0f} blocks={occ}")
A_mean /= n_avg

# --- figure: true vs inferred adjacency, rows/cols sorted by the block
# labels so the SBM's community structure is visible (the reference demos'
# deliverable, SURVEY.md §3.5) ---------------------------------------------
try:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
except ImportError:
    print("matplotlib unavailable; skipping figure")
    sys.exit(0)

order_true = np.argsort(np.asarray(true.state.net.c))
order_fit = np.argsort(np.asarray(model.state.net.c))
fig, axes = plt.subplots(1, 3, figsize=(13, 4.2))
axes[0].imshow(true.A[np.ix_(order_true, order_true)], cmap="Greys")
axes[0].set_title("true A (sorted by true blocks)")
axes[1].imshow(A_mean[np.ix_(order_true, order_true)], cmap="Greys")
axes[1].set_title("posterior mean A (same order)")
axes[2].imshow(A_mean[np.ix_(order_fit, order_fit)], cmap="Greys")
axes[2].set_title("posterior mean A (sorted by inferred blocks)")
for ax in axes:
    ax.set_xlabel("postsynaptic n")
axes[0].set_ylabel("presynaptic j")
out = os.path.join(os.path.dirname(__file__), "sbm_network.png")
fig.savefig(out, dpi=120, bbox_inches="tight")
print(f"wrote {out}")
