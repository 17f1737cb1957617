"""Demo: negative-binomial count observations with PG augmentation and
CRT-based dispersion learning (BASELINE config 2: N=50)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # zero-install run

import numpy as np

import pyglm_tpu as pt

N = 50
# NB's exp-mean link has positive feedback; weight scale must shrink with N
# for the autoregressive dynamics to stay stable (same property as the
# reference model).
true = pt.SparseNegativeBinomialGLM(
    N, B=4, L=10, seed=7,
    obs_kwargs=dict(r_init=5.0, resample_r=False, max_y=128),
    net_kwargs=dict(rho_init=0.05, learn_rho=False, sigma_w=0.001,
                    mu_bias=-2.5))
Y = true.generate(20_000, keep=False)
print(f"counts: mean={Y.mean():.2f}, max={Y.max():.0f}")

model = pt.SparseNegativeBinomialGLM(
    N, B=4, L=10, seed=0, obs_kwargs=dict(max_y=int(Y.max()) + 1))
model.add_data(Y)
for it in range(100):
    d = model.resample_model()
    if it % 10 == 0:
        r = np.asarray(model.state.aux["r"])
        print(f"iter {it}: ll={d['log_likelihood']:.0f} "
              f"edges={d['n_edges']:.0f} r=[{r.min():.2f},{r.max():.2f}]")
