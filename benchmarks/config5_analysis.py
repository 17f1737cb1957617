"""Config-5 (latent-distance, N=500) identifiability analysis.

VERDICT r1 task #3: is the weak link AUC (~0.66) a sampler/mixing problem
or a posterior ceiling? Protocol:

  A. truth-chain ceiling — run the GENERATING model's own Gibbs chain on
     its data, initialized AT the true parameters. Any AUC this chain's
     posterior-mean adjacency achieves is (an MC estimate of) the
     identifiability ceiling: no fitting chain can beat the posterior.
  B. fresh chain — same data, prior-initialized model, longer chain, with
     the HMC acceptance-rate diagnostic.

Run: python benchmarks/config5_analysis.py [--N 500] [--T 20000]
Results are summarized in BASELINE.md.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def chain_auc(model, true_A, n_burn, n_avg, label):
    from pyglm_tpu.utils.metrics import link_auc
    accepts = []
    for _ in range(n_burn):
        d = model.resample_model()
        accepts.append(d.get("hmc_accept", np.nan))
    A_acc = np.zeros_like(true_A)
    for _ in range(n_avg):
        d = model.resample_model()
        accepts.append(d.get("hmc_accept", np.nan))
        A_acc += model.A / n_avg
    auc = float(link_auc(A_acc, true_A))
    out = {"label": label, "auc": auc,
           "hmc_accept_mean": float(np.nanmean(accepts)),
           "n_burn": n_burn, "n_avg": n_avg}
    print(json.dumps(out))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--N", type=int, default=500)
    ap.add_argument("--T", type=int, default=20_000)
    ap.add_argument("--burn-fresh", type=int, default=300)
    ap.add_argument("--avg", type=int, default=100)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import pyglm_tpu as pt

    N, T = args.N, args.T
    true = pt.NonlinearAutoregressiveModel(
        N, B=4, L=10, observation="bernoulli", network="latent_distance",
        spike_and_slab=True, seed=5,
        net_kwargs=dict(dim=2, mu_bias=-3.0))
    Y = true.generate(T, keep=False)
    true_A = true.A.copy()
    print(json.dumps({"N": N, "T": T, "rate": float(Y.mean()),
                      "true_density": float(true_A.mean())}))

    # A. truth-initialized chain = identifiability ceiling.
    true.add_data(Y)
    t0 = time.time()
    res_a = chain_auc(true, true_A, n_burn=30, n_avg=args.avg,
                      label="truth_init_ceiling")
    print(f"phase A: {time.time()-t0:.0f}s")

    # B. fresh chain, longer burn.
    model = pt.NonlinearAutoregressiveModel(
        N, B=4, L=10, observation="bernoulli", network="latent_distance",
        spike_and_slab=True, seed=0, net_kwargs=dict(dim=2))
    model.add_data(Y)
    t0 = time.time()
    res_b = chain_auc(model, true_A, n_burn=args.burn_fresh, n_avg=args.avg,
                      label="fresh_long")
    print(f"phase B: {time.time()-t0:.0f}s")

    with open("config5_analysis.json", "w") as f:
        json.dump({"N": N, "T": T, "truth_init": res_a, "fresh": res_b}, f,
                  indent=1)


if __name__ == "__main__":
    main()
