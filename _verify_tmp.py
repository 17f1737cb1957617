import sys, time
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import pyglm_tpu as pt
t0 = time.time()
true = pt.SparseBernoulliGLM(30, B=4, L=10, seed=1,
    net_kwargs=dict(rho_init=0.12, learn_rho=False, mu_bias=-2.2,
                    sigma_bias=0.2, learn_weight_prior=False, sigma_w=1.2))
Y = true.generate(20000, keep=False)
print("generate done", time.time()-t0, flush=True)
m = pt.SparseBernoulliGLM(30, B=4, L=10, seed=0)
m.add_data(Y)
ll0 = float(m.log_likelihood())
print("ll0 done", time.time()-t0, flush=True)
A_sum = 0.0
for s in range(60):
    m.resample_model()
    if s == 0:
        print("first sweep done", time.time()-t0, flush=True)
    if s >= 30:
        A_sum = A_sum + np.asarray(m.A)
ll1 = float(m.log_likelihood())
from sklearn.metrics import roc_auc_score
mask = ~np.eye(30, dtype=bool)
auc = roc_auc_score(np.asarray(true.A)[mask].ravel(), (A_sum/30)[mask].ravel())
print(f"ll {ll0:.0f} -> {ll1:.0f}; link AUC {auc:.3f}", flush=True)
assert ll1 > ll0 and auc > 0.8
print("VERIFY OK (fused path end-to-end)")
