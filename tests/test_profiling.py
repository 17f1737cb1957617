import numpy as np

import pyglm_tpu as pt
from pyglm_tpu.diagnostics.profiling import PhaseTimer, sweep_breakdown


def test_phase_timer():
    pt_ = PhaseTimer()
    with pt_.phase("a"):
        x = np.ones(10)
    with pt_.phase("b") as box:
        import jax.numpy as jnp
        box["out"] = jnp.ones(10) * 2
    rep = pt_.report()
    assert "a" in rep and "b" in rep and "TOTAL" in rep


def test_sweep_breakdown_runs():
    m = pt.SparseBernoulliGLM(6, B=2, L=4, seed=0)
    m.generate(512, keep=True)
    times = sweep_breakdown(m, n_reps=1)
    assert set(times) >= {"psi_matmul", "pg_draws", "group_gram",
                          "spike_slab_scan", "network_resample"}
    assert all(v >= 0 for v in times.values())
