"""Tracing / profiling helpers (SURVEY.md §5: absent in the reference).

- ``phase``: context manager that wall-clocks a named phase with a real
  device sync (axon's block_until_ready does not block; we force a readback).
- ``trace``: wrapper around jax.profiler for TensorBoard-compatible traces.
- ``sweep_breakdown``: times each stage of a Gibbs sweep for a model at its
  registered data shapes — the tool used to drive the optimization rounds
  recorded in BASELINE.md.
"""
from __future__ import annotations

import contextlib
import time
from collections import OrderedDict

import numpy as np
import jax
import jax.numpy as jnp


def force_sync(x):
    """Synchronize by reading one scalar back to the host (axon-safe)."""
    leaves = [l for l in jax.tree.leaves(x) if hasattr(l, "ravel")]
    if leaves:
        float(jnp.asarray(leaves[0]).ravel()[0])
    return x


class PhaseTimer:
    def __init__(self):
        self.times = OrderedDict()

    @contextlib.contextmanager
    def phase(self, name: str, result_ref=None):
        t0 = time.perf_counter()
        box = {}
        try:
            yield box
        finally:
            if "out" in box:
                force_sync(box["out"])
            self.times[name] = self.times.get(name, 0.0) + (
                time.perf_counter() - t0)

    def report(self) -> str:
        total = sum(self.times.values())
        lines = [f"{'phase':24s} {'ms':>9s} {'%':>6s}"]
        for k, v in self.times.items():
            lines.append(f"{k:24s} {v * 1e3:9.1f} {100 * v / total:6.1f}")
        lines.append(f"{'TOTAL':24s} {total * 1e3:9.1f}")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(logdir: str = "/tmp/pyglm_trace"):
    """jax.profiler trace (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def sweep_breakdown(model, n_reps: int = 3) -> OrderedDict:
    """Per-stage timings of one Gibbs sweep at the model's data shapes.

    Stages: psi matmul, PG draws, group Gram blocks, spike-slab scan /
    dense solve, network resample. Returns OrderedDict[name -> seconds].
    """
    from pyglm_tpu.models.weights import (
        pack_weights, group_gram_blocks, resample_spike_slab_tspace,
        sufficient_stats, resample_dense, _auto_group)

    assert model.datas, "add data first"
    Xf = jnp.concatenate([d.Xf for d in model.datas], axis=0)
    Y = jnp.concatenate([d.Y for d in model.datas], axis=0)
    state = model.state
    w_full = pack_weights(state.A, state.W, state.b)
    hyp = model.network.edge_hypers(state.net)
    key = jax.random.key(0)
    B = model.B

    pt = PhaseTimer()
    psi_f = jax.jit(lambda X, w: X @ w)
    pg_f = jax.jit(lambda k, Yv, p: model.observation.omega_kappa(
        k, Yv, p, state.aux))

    # warmup
    psi = force_sync(psi_f(Xf, w_full))
    omega, kappa = pg_f(key, Y, psi)
    force_sync(omega)
    G = _auto_group((model.P - 1) // B, B)
    gg = force_sync(group_gram_blocks(Xf, omega, B, G))
    if model.spike_and_slab:
        force_sync(resample_spike_slab_tspace(
            key, Xf, omega, kappa, w_full, hyp, B))
    net_f = jax.jit(lambda k, A, W: model.network.resample(k, state.net, A, W))
    force_sync(net_f(key, state.A, state.W))

    for _ in range(n_reps):
        with pt.phase("psi_matmul") as box:
            box["out"] = psi_f(Xf, w_full)
        with pt.phase("pg_draws") as box:
            omega, kappa = pg_f(key, Y, psi)
            box["out"] = omega
        with pt.phase("group_gram") as box:
            box["out"] = group_gram_blocks(Xf, omega, B, G)
        if model.spike_and_slab:
            with pt.phase("spike_slab_scan") as box:
                box["out"] = resample_spike_slab_tspace(
                    key, Xf, omega, kappa, w_full, hyp, B)
        with pt.phase("network_resample") as box:
            box["out"] = net_f(key, state.A, state.W)

    return OrderedDict((k, v / n_reps) for k, v in pt.times.items())
