"""Hoist-proof per-stage microbenchmarks of the flagship Gibbs sweep.

Methodology (the three traps that silently corrupt naive TPU timings here
— see CLAUDE.md):
  1. the axon tunnel adds a fixed ~31 ms host readback per timed run:
     every stage is scanned R times inside ONE jit and the readback is
     amortized (and reported separately as the 'baseline' row);
  2. XLA hoists loop-invariant computation out of `lax.scan`: every
     stage's inputs are perturbed with the loop index (i * 1e-9) or a
     per-iteration PRNG key, so the body cannot be lifted;
  3. XLA narrows a dot whose output is only sliced: results are consumed
     with a full reduction.

Run: python benchmarks/microbench.py [--small | --config5 | --nb]
                                     [--prec=default|sr|high|highest]
Prints one line per stage (ms per sweep-equivalent call).
--config5 swaps the flagship shapes for BASELINE config 5's (N=500,
T=20k, latent-distance prior) — the stage ledger behind the config-5
sweeps/s numbers in BASELINE.md. --nb keeps the flagship shapes but
swaps in negative-binomial observations (gamma-series PG + CRT r).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

R = 50


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax import lax
    import pyglm_tpu as pt
    from pyglm_tpu.models.weights import pack_weights, _auto_group

    small = "--small" in sys.argv
    cfg5 = "--config5" in sys.argv
    nb = "--nb" in sys.argv
    prec = "default"
    for a in sys.argv:
        if a.startswith("--prec="):
            prec = a.split("=", 1)[1]
    N, T, B, L = (20, 5_000, 4, 10) if small else (
        (500, 20_000, 4, 10) if cfg5 else (200, 100_000, 4, 10))
    if nb:
        from common import nb_flagship_models
        true, fresh, Y = nb_flagship_models(pt, jnp, N, T, B=B, L=L)
        model = fresh(prec)
    elif cfg5:
        true = pt.NonlinearAutoregressiveModel(
            N, B=B, L=L, observation="bernoulli",
            network="latent_distance", spike_and_slab=True, seed=5,
            net_kwargs=dict(dim=2, mu_bias=-3.0))
        Y = true.generate(T, keep=False)
        model = pt.NonlinearAutoregressiveModel(
            N, B=B, L=L, observation="bernoulli",
            network="latent_distance", spike_and_slab=True, seed=0,
            net_kwargs=dict(dim=2), precision=prec)
    else:
        true = pt.SparseBernoulliGLM(
            N, B=B, L=L, seed=42,
            net_kwargs=dict(rho_init=0.05, learn_rho=False, mu_bias=-2.5,
                            sigma_bias=0.25, learn_weight_prior=False,
                            sigma_w=1.0))
        Y = true.generate(T, keep=False)
        model = pt.SparseBernoulliGLM(N, B=B, L=L, seed=0, precision=prec)
    model.add_data(Y)
    d = model.datas[0]
    state = model.state
    obs = model.observation
    w0 = pack_weights(state.A, state.W, state.b)
    keys = jax.random.split(jax.random.key(0), R)
    iota = jnp.arange(R, dtype=jnp.float32)

    def timeit(name, body, *args):
        @jax.jit
        def run(*args):
            def step(c, ki):
                k, i = ki
                return c + body(*args, k, i), None
            return lax.scan(step, 0.0, (keys, iota))[0]
        float(run(*args))
        reps = []
        for _ in range(4):
            t0 = time.time()
            float(run(*args))
            reps.append((time.time() - t0) / R)
        print(f"{name:34s} {np.median(reps) * 1e3:8.3f} ms/iter")

    timeit("baseline (readback/R)", lambda k, i: i)
    timeit("psi matmul", lambda Xf, w, k, i: jnp.sum(jnp.dot(
        Xf, w + i * 1e-9, preferred_element_type=jnp.float32)), d.Xf, w0)
    psi0 = jnp.dot(d.Xf, w0, preferred_element_type=jnp.float32)
    timeit("PG draws (omega, kappa)",
           lambda Y_, psi, k, i: jnp.sum(obs.omega_kappa(
               k, Y_, psi, state.aux)[0]), d.Y, psi0)
    om0, ka0 = obs.omega_kappa(jax.random.key(1), d.Y, psi0, state.aux)
    hyp = model.network.edge_hypers(state.net)
    from pyglm_tpu.models.weights import resample_spike_slab_tspace
    timeit(f"spike-slab stage (fused, {prec})",
           lambda Xf, Xt, om, ka, psi, w, k, i: jnp.sum(
               resample_spike_slab_tspace(
                   k, Xf, om, ka, w, hyp, B, precision=prec,
                   psi=psi + i * 1e-9, Xt=Xt)[1]),
           d.Xf, d.Xt, om0, ka0, psi0, w0)
    timeit("network resample",
           lambda A, W, k, i: jnp.sum(jax.tree.leaves(
               model.network.resample(k, state.net, A, W))[0]),
           state.A, state.W)
    timeit("log-likelihood",
           lambda Y_, psi, k, i: jnp.sum(obs.log_likelihood(
               Y_, psi + i * 1e-9, state.aux)), d.Y, psi0)
    if isinstance(state.aux, dict) and "r" in state.aux:
        timeit("NB aux resample (CRT r)",
               lambda Y_, psi, k, i: jnp.sum(obs.resample_aux(
                   k, state.aux, Y_, psi + i * 1e-9,
                   cache=d.llc)["r"]), d.Y, psi0)
    sweep = model._sweep
    timeit("FULL sweep",
           lambda st, ds, k, i: sweep(k, st, ds)[1]["log_likelihood"],
           state, tuple(model.datas))


if __name__ == "__main__":
    main()
