import time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import pyglm_tpu as pt

N, T, B, L = 200, 100_000, 4, 10
true = pt.SparseBernoulliGLM(N, B=B, L=L, seed=42,
    net_kwargs=dict(rho_init=0.05, learn_rho=False, mu_bias=-2.5,
                    sigma_bias=0.25, learn_weight_prior=False, sigma_w=1.0))
Y = true.generate(T, keep=False)
model = pt.SparseBernoulliGLM(N, B=B, L=L, seed=0, precision="high")
model.add_data(Y)
sweep = model._sweep
NT = 25

@jax.jit
def run_k(key, state, datas):
    def body(s, kk):
        s, d = sweep(kk, s, datas)
        return s, d["log_likelihood"]
    return jax.lax.scan(body, state, jax.random.split(key, NT))

datas = tuple(model.datas)
state = model.state
for i in range(2):
    state, lls = run_k(jax.random.key(i), state, datas)
    float(lls[-1])
reps = []
for i in range(3):
    t0 = time.time()
    state, lls = run_k(jax.random.key(100 + i), state, datas)
    float(lls[-1])
    reps.append((time.time() - t0) / NT)
dt = float(np.median(reps))
print(f"precision=high: {1/dt:.2f} sweeps/s ({dt*1e3:.1f} ms/sweep)")
