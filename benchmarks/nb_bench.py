"""NB-flagship throughput: Gibbs sweeps/sec for the negative-binomial GLM
at the flagship shapes (N=200, T=100k, B=4) — the config whose hot loop is
the gamma-series PG kernel (b = y + r is non-integer), not Devroye.

Methodology matches bench.py exactly: sweeps scanned on device inside one
jit, readback amortized over N_TIMED iterations, datas passed as arguments.
Also times the gamma-series kernel alone at the 20M-auxiliary count.

Run on TPU: python benchmarks/nb_bench.py [--small]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N, T, B, L = 200, 100_000, 4, 10
N_WARMUP, N_TIMED = 2, 50


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax import lax
    import numpy as np
    import pyglm_tpu as pt

    from common import nb_flagship_models

    small = "--small" in sys.argv
    n, t = (20, 5_000) if small else (N, T)

    true, fresh, Y = nb_flagship_models(pt, jnp, n, t, B=B, L=L)

    def measure(precision):
        model = fresh(precision)
        model.add_data(Y)
        sweep = model._sweep

        @jax.jit
        def run_k(key, state, datas):
            def body(s, kk):
                s, d = sweep(kk, s, datas)
                return s, d["log_likelihood"]
            return lax.scan(body, state, jax.random.split(key, N_TIMED))

        datas = tuple(model.datas)
        state = model.state
        for i in range(N_WARMUP):
            state, lls = run_k(jax.random.key(i), state, datas)
            float(lls[-1])
        reps = []
        for i in range(3):
            t0 = time.time()
            state, lls = run_k(jax.random.key(100 + i), state, datas)
            ll = float(lls[-1])
            reps.append((time.time() - t0) / N_TIMED)
        assert np.isfinite(ll)
        return 1.0 / float(np.median(reps))

    # Gamma-series PG kernel alone at the flagship auxiliary count,
    # scanned with key-variant inputs so nothing is hoisted.
    from pyglm_tpu.ops.pg_pallas import pg_gamma_series_pallas
    b0 = jnp.full((t, n), 4.5, jnp.float32)
    c0 = jnp.full((t, n), 1.0, jnp.float32)
    R = 50        # >= 50 scanned iters so the ~31 ms axon readback
                  # amortizes below the measurement noise (CLAUDE.md)

    @jax.jit
    def pg_run(b, c):
        def step(acc, k):
            return acc + pg_gamma_series_pallas(
                k, b + acc * 1e-30, c).sum(), None
        return lax.scan(step, 0.0, jax.random.split(jax.random.key(0), R))[0]

    float(pg_run(b0, c0))
    t0 = time.time()
    float(pg_run(b0, c0))
    pg_ms = (time.time() - t0) / R * 1e3

    high = measure("high")
    fast = measure("default")
    sr = measure("sr")
    print(json.dumps({
        "metric": "nb_flagship_sweeps_per_sec",
        "value": round(high, 2), "unit": "sweeps/s",
        "value_fast": round(fast, 2),
        "value_sr": round(sr, 2),
        "pg_gamma_kernel_ms": round(pg_ms, 2),
        "shapes": {"N": n, "T": t, "B": B},
    }))


if __name__ == "__main__":
    main()
