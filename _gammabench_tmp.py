import time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from pyglm_tpu.ops.pg_pallas import pg_gamma_series_pallas

R = 10
T, N = 100_000, 200
b = 1.0 + jax.random.gamma(jax.random.key(0), 2.0, (T, N))  # NB-like b=y+r
psi = -2.0 + 1.0 * jax.random.normal(jax.random.key(1), (T, N))
keys = jax.random.split(jax.random.key(2), R)

@jax.jit
def run(b, psi):
    def body(c, k):
        om = pg_gamma_series_pallas(k, b, psi)
        return c + jnp.sum(om), None
    return lax.scan(body, 0.0, keys)[0]

float(run(b, psi))
reps = []
for _ in range(4):
    t0 = time.time(); float(run(b, psi)); reps.append((time.time()-t0)/R)
print(f"pg_gamma_series_pallas 20M: {np.median(reps)*1e3:.2f} ms/call")
