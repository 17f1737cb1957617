"""Demo: exact chain checkpoint/resume.

MCMC state is an explicit pytree, so checkpointing is exact: saving and
reloading resumes the SAME chain (identical PRNG stream), unlike the
reference's pickle-by-convention approach.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # zero-install run

import numpy as np

import pyglm_tpu as pt
from pyglm_tpu.utils.checkpoint import save_state, load_state

model = pt.SparseBernoulliGLM(10, B=4, L=10, seed=0)
Y = model.generate(5000, keep=True)
for _ in range(20):
    model.resample_model()

path = "/tmp/pyglm_chain.npz"
save_state(path, model)
print(f"saved chain state to {path}")

# ... later / elsewhere: rebuild the same config and resume
resumed = pt.SparseBernoulliGLM(10, B=4, L=10, seed=999)  # seed irrelevant
resumed.add_data(Y)
load_state(path, resumed)

d1 = model.resample_model()
d2 = resumed.resample_model()
print(f"continued:  ll={d1['log_likelihood']:.3f}")
print(f"resumed:    ll={d2['log_likelihood']:.3f}")
assert d1["log_likelihood"] == d2["log_likelihood"], "chains diverged!"
print("exact resume verified (identical trajectories)")
