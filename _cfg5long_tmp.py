"""Config-5: long-chain convergence profile (8000 sweeps)."""
import time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import pyglm_tpu as pt
from pyglm_tpu.utils.metrics import link_auc

N, T = 500, 20_000
true = pt.NonlinearAutoregressiveModel(
    N, B=4, L=10, observation="bernoulli", network="latent_distance",
    spike_and_slab=True, seed=5, net_kwargs=dict(dim=2, mu_bias=-3.0))
Y = true.generate(T, keep=False)
true_A = true.A.copy()
model = pt.NonlinearAutoregressiveModel(
    N, B=4, L=10, observation="bernoulli", network="latent_distance",
    spike_and_slab=True, seed=0, net_kwargs=dict(dim=2))
model.add_data(Y)
A_buf = []
t0 = time.time()
W = 400
for s in range(1, 8001):
    d = model.resample_model()
    A_buf.append(model.A)
    if len(A_buf) > W:
        A_buf.pop(0)
    if s % 500 == 0:
        auc = link_auc(np.mean(A_buf, axis=0), true_A)
        print(f"sweep {s}: AUC {auc:.3f} ({time.time()-t0:.0f}s)", flush=True)
