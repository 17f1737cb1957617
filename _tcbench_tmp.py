import sys, time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import pyglm_tpu as pt
from pyglm_tpu.models.weights import pack_weights, resample_spike_slab_tspace

N, T, B, L = 200, 100_000, 4, 10
R = 50
true = pt.SparseBernoulliGLM(N, B=B, L=L, seed=42,
    net_kwargs=dict(rho_init=0.05, learn_rho=False, mu_bias=-2.5,
                    sigma_bias=0.25, learn_weight_prior=False, sigma_w=1.0))
Y = true.generate(T, keep=False)
model = pt.SparseBernoulliGLM(N, B=B, L=L, seed=0, precision="default")
model.add_data(Y)
d = model.datas[0]; st = model.state
w0 = pack_weights(st.A, st.W, st.b)
hyp = model.network.edge_hypers(st.net)
psi0 = jnp.dot(d.Xf, w0, preferred_element_type=jnp.float32)
om0, ka0 = model.observation.omega_kappa(jax.random.key(1), d.Y, psi0, st.aux)
keys = jax.random.split(jax.random.key(0), R)
iota = jnp.arange(R, dtype=jnp.float32)

def timeit(name, tc, G, prec):
    @jax.jit
    def run(Xf, Xt, om, ka, psi, w):
        def step(c, ki):
            k, i = ki
            out = resample_spike_slab_tspace(
                k, Xf, om, ka, w, hyp, B, t_chunk=tc, precision=prec,
                psi=psi + i * 1e-9, Xt=Xt, group=G)
            return c + jnp.sum(out[1]), None
        return lax.scan(step, 0.0, (keys, iota))[0]
    float(run(d.Xf, d.Xt, om0, ka0, psi0, w0))
    reps = []
    for _ in range(4):
        t0 = time.time(); float(run(d.Xf, d.Xt, om0, ka0, psi0, w0))
        reps.append((time.time()-t0)/R)
    print(f"{name:28s} {np.median(reps)*1e3:8.3f} ms/iter")

for tc, G, prec in [(512, 8, "default"), (1024, 8, "default"),
                    (512, 10, "default"), (1024, 8, "high"), (512, 8, "high")]:
    timeit(f"fused tc={tc} G={G} {prec}", tc, G, prec)
