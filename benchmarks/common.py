"""Shared benchmark fixtures.

The NB flagship fixture is used by BOTH benchmarks/nb_bench.py (the
throughput number in BASELINE.md) and benchmarks/microbench.py --nb (the
stage ledger that decomposes that number) — one definition so the two
can never silently diverge.
"""


def nb_flagship_models(pt, jnp, n, t, B=4, L=10):
    """(true_model, fresh_model, Y) for the NB flagship configuration."""
    true = pt.SparseNegativeBinomialGLM(
        n, B=B, L=L, seed=42,
        net_kwargs=dict(rho_init=0.05, learn_rho=False, mu_bias=-2.0,
                        sigma_bias=0.25, learn_weight_prior=False,
                        sigma_w=0.003),
        obs_kwargs=dict(max_y=16))
    Y = jnp.minimum(true.generate(t, keep=False), 15.0)

    def fresh(precision="default"):
        return pt.SparseNegativeBinomialGLM(
            n, B=B, L=L, seed=0, precision=precision,
            obs_kwargs=dict(max_y=16))

    return true, fresh, Y
