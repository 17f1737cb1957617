"""Demo: neuron+time-sharded SPMD Gibbs over a device mesh (BASELINE
config 5: latent-distance prior, N=500, multi-chip).

On a single-chip box, simulate devices first:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 python examples/multichip.py
(with jax platform forced to cpu; on a real TPU pod slice it runs as-is).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # zero-install run

import jax
import numpy as np

import pyglm_tpu as pt
from pyglm_tpu.parallel.sharding import best_mesh_for

N = 500
print(f"devices: {jax.devices()}")

true = pt.NonlinearAutoregressiveModel(
    N, B=4, L=10, observation="bernoulli", network="latent_distance",
    spike_and_slab=True, seed=11,
    net_kwargs=dict(dim=2, mu_bias=-3.0))
Y = true.generate(10_000, keep=False)
print(f"rate={Y.mean():.3f}")

model = pt.NonlinearAutoregressiveModel(
    N, B=4, L=10, observation="bernoulli", network="latent_distance",
    spike_and_slab=True, seed=0, net_kwargs=dict(dim=2))
model.add_data(Y)
mesh = best_mesh_for(N, T=[10_000])
print(f"mesh: {dict(mesh.shape)}")
model.shard(mesh)

for it in range(20):
    d = model.resample_model()
    if it % 5 == 0:
        print(f"iter {it}: ll={d['log_likelihood']:.0f} "
              f"edges={d['n_edges']:.0f}")
