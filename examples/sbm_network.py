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
for it in range(100):
    d = model.resample_model()
    if it % 10 == 0:
        c = np.asarray(model.state.net.c)
        occ = np.bincount(c, minlength=K)
        print(f"iter {it}: ll={d['log_likelihood']:.0f} blocks={occ}")
