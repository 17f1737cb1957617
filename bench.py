"""Headline benchmark: Gibbs sweeps/sec on the flagship config.

Config (BASELINE.json metric): sparse Bernoulli network GLM, Erdős–Rényi
spike-and-slab, N=200 neurons, T=100k bins, B=4 basis filters — one full
Gibbs sweep = PG draws for all 20M auxiliaries + X'OmegaX stats for all
neurons + collapsed spike-and-slab over all 40k edges + network hypers.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline",
"value_fast", "vs_baseline_fast", "value_sr"} — `value` is the
LIBRARY-DEFAULT precision ("high": bf16x3 fused stats, f32-grade);
`value_fast` is the opt-in bf16 speed mode (precision="default",
parity-validated vs the f64 oracle at the tests/test_numpy_parity.py
protocol); `value_sr` is the unbiased stochastic-rounding mode
(precision="sr", ops/ss_pallas.py). VERDICT r2 weak #2:
the headline number is now the default mode, with the speed mode reported
alongside rather than silently substituted.

vs_baseline denominator: 0.002254 sweeps/s — the architecture-faithful
NumPy/f64 re-implementation (pyglm_tpu/reference/numpy_ref.py) at N=200,
measured at T in {1k, 3k} (round 1) and fitted linearly
(sweep = 4.3 s + 4.39 s per 1k bins -> 444 s at T=100k). Round-3 check
points at T=10k (82.5 s) and T=20k (199.2 s) show the true cost is
SUPER-linear beyond the fitted range (the working set leaves cache; the
10k->20k slope is 11.7 s per 1k bins), so 444 s at T=100k is a LOWER
bound on the true CPU cost (last-segment extrapolation gives ~1135 s) and
the reported vs_baseline is conservative by ~2.6x. The true reference
(slinderman/pyglm) is unbuildable here — its mount is empty (SURVEY.md
provenance note); the stand-in mirrors its per-neuron loop architecture.
"""
import json
import sys
import time

import numpy as np

CPU_BASELINE_SWEEPS_PER_SEC = 0.002254

N, T, B, L = 200, 100_000, 4, 10
# N_TIMED amortizes the ~30 ms axon-tunnel readback that ends each timed
# run (block_until_ready does not block on axon; the sync is a host
# readback) — at 50 scanned sweeps/run it attributes ~0.6 ms/sweep.
N_WARMUP, N_TIMED = 2, 50


def main():
    import jax
    # Remote (axon) compiles are slow; persist them across runs.
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import pyglm_tpu as pt

    small = "--small" in sys.argv          # quick self-check mode
    n, t = (20, 5_000) if small else (N, T)

    true = pt.SparseBernoulliGLM(
        n, B=B, L=L, seed=42,
        net_kwargs=dict(rho_init=0.05, learn_rho=False, mu_bias=-2.5,
                        sigma_bias=0.25, learn_weight_prior=False,
                        sigma_w=1.0))
    Y = true.generate(t, keep=False)

    def measure(precision):
        # Time the chain the way the library runs chains: sweeps scanned on
        # device (fit_compiled's shape), so per-sweep host dispatch (~30 ms
        # through the axon tunnel) is not billed to the sampler. datas is an
        # ARGUMENT, not a closure — closing over the 320 MB design tensor
        # overflows the remote-compile relay (CLAUDE.md).
        model = pt.SparseBernoulliGLM(n, B=B, L=L, seed=0,
                                      precision=precision)
        model.add_data(Y)
        sweep = model._sweep

        @jax.jit
        def run_k(key, state, datas):
            def body(s, kk):
                s, d = sweep(kk, s, datas)
                return s, d["log_likelihood"]
            return jax.lax.scan(body, state, jax.random.split(key, N_TIMED))

        datas = tuple(model.datas)
        state = model.state
        for i in range(N_WARMUP):
            state, lls = run_k(jax.random.key(i), state, datas)
            float(lls[-1])         # host readback = real sync (axon)
        reps = []
        for i in range(3):
            t0 = time.time()
            state, lls = run_k(jax.random.key(100 + i), state, datas)
            ll = float(lls[-1])
            reps.append((time.time() - t0) / N_TIMED)
        assert np.isfinite(ll)
        return 1.0 / float(np.median(reps))

    # Headline = the library default ("high": bf16x3 fused stats, f32-grade
    # accuracy). "default" = the opt-in single-bf16-pass speed mode,
    # posterior-parity-validated (max edge-marginal diff 0.15 @ 400 samples
    # vs the f64 oracle — the tests/test_numpy_parity.py protocol).
    value = measure("high")
    value_fast = measure("default")
    # "sr" = stochastically-rounded single-pass Gram stats: unbiased
    # (zero-mean ~1e-5 relative noise at this T) at near-speed-mode cost.
    value_sr = measure("sr")
    print(json.dumps({
        "metric": f"gibbs_sweeps_per_sec_N{n}_T{t}_B{B}",
        "value": round(value, 4),
        "unit": "sweeps/s",
        "vs_baseline": round(value / CPU_BASELINE_SWEEPS_PER_SEC, 1),
        "value_fast": round(value_fast, 4),
        "vs_baseline_fast": round(value_fast / CPU_BASELINE_SWEEPS_PER_SEC,
                                  1),
        "value_sr": round(value_sr, 4),
    }))


if __name__ == "__main__":
    main()
