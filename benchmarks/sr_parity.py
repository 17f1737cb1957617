"""Posterior-chain parity of the precision modes vs the f64 NumPy oracle.

The per-update evidence for the 'sr' / 'default' speed modes is the
fused-vs-staged z-protocol (tests/test_ss_fused.py); this script is the
chain-level complement, mirroring the tests/test_numpy_parity.py protocol
but ON THE REAL TPU and at a shape that actually engages the fused
spike-and-slab kernel (N=8, B=4 -> GB=32, T=1500): run one Gibbs chain
per precision mode plus the independent NumPy/f64 reference chain on the
same data/priors, and compare posterior edge marginals, weight means, and
bias means. All modes must sit inside the same MC tolerance — 'high' is
the control that calibrates it.

Run: python benchmarks/sr_parity.py        (~6 min: TPU chains + the
     per-neuron-loop NumPy chain). Results recorded in BASELINE.md.
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

N, B, L, T = 8, 4, 10, 1500
RHO, SIGMA_W, MU_B, SIGMA_B = 0.35, 0.8, -1.2, 0.4
N_BURN, N_KEEP = 150, 400


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import pyglm_tpu as pt
    from pyglm_tpu.ops.basis import cosine_basis
    from pyglm_tpu.reference.numpy_ref import NumpyGLMReference

    basis = cosine_basis(B=B, L=L)
    kw = dict(rho_init=RHO, learn_rho=False, mu_bias=MU_B,
              sigma_bias=SIGMA_B, learn_weight_prior=False,
              sigma_w=SIGMA_W)
    gen = pt.SparseBernoulliGLM(N, basis=basis, seed=123, net_kwargs=kw)
    Y = np.asarray(gen.generate(T, keep=False), np.float64)

    def tpu_chain(precision):
        m = pt.SparseBernoulliGLM(N, basis=basis, seed=0, net_kwargs=kw,
                                  precision=precision)
        m.add_data(Y)
        A = np.zeros((N, N)); W = np.zeros((N, N)); b = np.zeros(N)
        t0 = time.time()
        for it in range(N_BURN + N_KEEP):
            m.resample_model()
            if it >= N_BURN:
                A += m.A / N_KEEP
                W += m.W_effective / N_KEEP
                b += m.bias / N_KEEP
        print(f"  [{precision}] chain {time.time() - t0:.0f}s",
              file=sys.stderr)
        return A, W, b

    # NumPy/f64 oracle chain (independently written sampler, same target).
    ref = NumpyGLMReference(N=N, B=B, basis=basis, rho=RHO, mu_w=0.0,
                            sigma_w=SIGMA_W, mu_b=MU_B, sigma_b=SIGMA_B,
                            seed=7)
    Xf = ref.design(Y)
    A2 = np.zeros((N, N)); W2 = np.zeros((N, N)); b2 = np.zeros(N)
    t0 = time.time()
    for it in range(N_BURN + N_KEEP):
        ref.resample(Y, Xf)
        if it >= N_BURN:
            A2 += ref.A / N_KEEP
            W2 += (ref.A[:, :, None] * ref.W).sum(-1) / N_KEEP
            b2 += ref.b / N_KEEP
    print(f"  [numpy/f64] chain {time.time() - t0:.0f}s", file=sys.stderr)

    out = {}
    for prec in ("high", "default", "sr"):
        A1, W1, b1 = tpu_chain(prec)
        out[prec] = {
            "max_edge_marginal_diff": round(float(np.max(np.abs(A1 - A2))), 4),
            "max_weight_mean_diff": round(float(np.max(np.abs(W1 - W2))), 4),
            "max_bias_mean_diff": round(float(np.max(np.abs(b1 - b2))), 4),
            "mean_edge_prob_diff": round(float(abs(A1.mean() - A2.mean())), 4),
        }
    print(json.dumps({"protocol": f"N{N}_B{B}_T{T}_keep{N_KEEP}",
                      "vs": "NumpyGLMReference f64", **out}))


if __name__ == "__main__":
    main()
