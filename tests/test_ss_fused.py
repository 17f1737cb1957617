"""Statistical parity of the fully-fused spike-and-slab kernel
(ops/ss_pallas.py) against the staged XLA/Pallas path.

The fused kernel draws with the in-kernel hardware PRNG, so parity is
distributional (independent streams): per-edge acceptance probabilities and
per-coefficient weight means are compared with pooled two-sample z-scores.
Runs only on real TPU (PYGLM_TEST_TPU=1), like the PG kernel suite.
"""
import os

import numpy as np
import pytest

if not os.environ.get("PYGLM_TEST_TPU"):
    pytest.skip("TPU-only lane (set PYGLM_TEST_TPU=1)",
                allow_module_level=True)

import jax
import jax.numpy as jnp

import pyglm_tpu as pt
from pyglm_tpu.models.weights import (pack_weights,
                                      resample_spike_slab_tspace)


@pytest.mark.parametrize("gram", ["bf16x3", "bf16", "sr"])
def test_group_pass_kernel_matches_xla(gram):
    """The per-group fused pass (the local piece of the mesh-sharded
    spike-and-slab, ops/ss_pallas.py ss_group_pass_pallas) is deterministic
    given its inputs (gram='sr' adds zero-mean rounding noise) — compare
    directly against the XLA math."""
    from pyglm_tpu.ops.ss_pallas import ss_group_pass_pallas, ss_group_pass_tc
    rng = np.random.RandomState(0)
    GB, T, N = 16, 1000, 24
    tc = ss_group_pass_tc(T, 512)
    pad_t = -(-T // tc) * tc - T
    npad = 128
    Xp = jnp.asarray(rng.randn(GB, T), jnp.float32)
    Xg = jnp.asarray(rng.randn(GB, T), jnp.float32)
    om = jnp.asarray(rng.rand(T, N) + 0.1, jnp.float32)
    u = jnp.asarray(rng.randn(T, N), jnp.float32)
    dW = jnp.asarray(rng.randn(GB, N) * 0.1, jnp.float32)
    # Stream formats per mode (ss_pallas module docstring): omega bf16 for
    # the speed modes; u stays f32 in the library (the bf16-u A/B was
    # net-negative) but the kernel handles it generically by dtype — the
    # 'sr' case exercises that path to keep the capability covered. The
    # XLA reference below consumes the SAME rounded inputs, so tolerances
    # only cover the in-kernel arithmetic + the SR output write.
    if gram in ("bf16", "sr"):
        om = om.astype(jnp.bfloat16)
    u_in = u.astype(jnp.bfloat16) if gram == "sr" else u
    om_p = jnp.pad(om, ((0, pad_t), (0, npad - N)))
    u_p = jnp.pad(u_in, ((0, pad_t), (0, npad - N)))
    dW_p = jnp.pad(dW, ((0, 0), (0, npad - N)))
    u_new, M0, Jgg = ss_group_pass_pallas(
        Xp, Xg, om_p, u_p, dW_p, T, t_chunk=512, gram=gram,
        seed=jnp.asarray([11, 7], jnp.int32))
    u_new = np.asarray(u_new, np.float32)[:T, :N]
    M0 = np.asarray(M0)[:, :N]
    Jgg = np.asarray(Jgg)[:, :N]

    om_np = np.asarray(om, np.float32)
    u_np = np.asarray(u_in, np.float32)
    u_ref = u_np - om_np * (np.asarray(Xp).T @ np.asarray(dW))
    M0_ref = np.asarray(Xg) @ u_ref
    Z = (np.asarray(Xg)[:, None, :] * np.asarray(Xg)[None, :, :]
         ).reshape(GB * GB, T)
    Jgg_ref = Z @ om_np

    def rel(a, b):
        return np.max(np.abs(a - b)) / np.max(np.abs(b))

    # 'sr' writes u back through stochastic rounding: error up to one FULL
    # bf16 ulp (2^-7 relative, vs RTN's half-ulp) on some element.
    assert rel(u_new, u_ref) < (2 ** -7 * 1.3 if gram == "sr" else 1e-4)
    assert rel(M0, M0_ref) < 1e-4            # bf16x3 gather (f32 u in VMEM)
    # 'sr' noise is zero-mean with std ~ one bf16 ulp / sqrt(T_eff); this
    # rel() is a max over ~6k entries, so bound ~5 sigma of the measured
    # noise scale (typ. 5e-4 here) — still well under truncated-bf16's bias.
    tol = {"bf16": 5e-3, "sr": 2e-3, "bf16x3": 1e-4}[gram]
    assert rel(Jgg, Jgg_ref) < tol


def test_stochastic_rounding_unbiased():
    """_sr16 (the gram='sr' primitive): every output must be one of the two
    bf16 neighbors of the input, exactly-representable inputs must be
    preserved, and the mean over repeated roundings must converge to the
    f32 input (unbiasedness — the property the 'sr' precision mode rests
    on)."""
    from functools import partial
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from pyglm_tpu.ops.ss_pallas import _sr16

    def kernel(seed_ref, x_ref, o_ref):
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        o_ref[:] = _sr16(x_ref[:]).astype(jnp.float32)

    R = 512
    x = np.abs(np.random.RandomState(0).randn(64, 256)).astype(np.float32)
    x += 0.01
    out = pl.pallas_call(
        kernel,
        grid=(R,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((64, 256), lambda r: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((64, 256), lambda r: (r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R * 64, 256), jnp.float32),
    )(jnp.asarray([1234], jnp.int32), jnp.asarray(x))
    out = np.asarray(out).reshape(R, 64, 256)

    u = x.view(np.int32)
    flo = (u & -65536).view(np.float32)
    fhi = ((u & -65536) + 65536).view(np.float32)
    assert np.all((out >= flo[None]) & (out <= fhi[None]))
    exact = x == flo
    assert np.all(out[:, exact] == x[exact])
    gap = fhi - flo
    se = np.maximum(gap * 0.5 / np.sqrt(R), 1e-12)
    z = np.abs(out.mean(0) - x) / se
    # 16k cells; N(0,1) max should sit near 4 — 6 is a ~1e-5 family level
    assert float(z[~exact].max()) < 6.0, float(z[~exact].max())


def test_fused_wide_lanes_compile():
    """N=500 (npad=512 lanes, the BASELINE config-5 width) must compile and
    run through the whole model path: r2's final 1024-row-chunk commit
    silently pushed wide-lane models over the 16M scoped-vmem limit (the
    caller now caps tc * npad); this guards the compile envelope."""
    N, T = 500, 1024
    m = pt.NonlinearAutoregressiveModel(
        N, B=4, L=10, observation="bernoulli", network="latent_distance",
        spike_and_slab=True, seed=0, net_kwargs=dict(dim=2))
    rng = np.random.RandomState(0)
    m.add_data((rng.rand(T, N) < 0.1).astype(np.float32))
    d = m.resample_model()
    assert np.isfinite(d["log_likelihood"])


# T=4000 exercises the flagship multi-chunk schedule; T=900 forces the
# short-T chunk clamp (t_chunk drops to ceil(T/4), keeping >= 4 grid steps
# on the aliased-residual axis — advisor r2 medium finding).
@pytest.mark.parametrize("precision,T", [
    ("high", 4000), ("default", 4000), ("sr", 4000), ("high", 900)])
def test_fused_matches_staged_distribution(precision, T):
    N, B, L = 24, 4, 10
    true = pt.SparseBernoulliGLM(
        N, B=B, L=L, seed=3,
        net_kwargs=dict(rho_init=0.2, learn_rho=False, mu_bias=-2.0))
    Y = true.generate(T, keep=False)
    m = pt.SparseBernoulliGLM(N, B=B, L=L, seed=0)
    m.add_data(Y)
    d = m.datas[0]
    st = m.state
    w0 = pack_weights(st.A, st.W, st.b)
    hyp = m.network.edge_hypers(st.net)
    psi = jnp.dot(d.Xf, w0, preferred_element_type=jnp.float32)
    om, ka = m.observation.omega_kappa(jax.random.key(1), d.Y, psi, st.aux)

    @jax.jit
    def run_fused(k):
        return resample_spike_slab_tspace(
            k, d.Xf, om, ka, w0, hyp, B, precision=precision, psi=psi,
            Xt=d.Xt)

    @jax.jit
    def run_staged(k):
        return resample_spike_slab_tspace(
            k, d.Xf, om, ka, w0, hyp, B, precision=precision, psi=psi,
            Xt=None)

    R = 250
    keys = jax.random.split(jax.random.key(7), R)
    Af_s = np.zeros((N, N))
    Ax_s = np.zeros((N, N))
    wf_s = wx_s = wf2 = wx2 = 0.0
    uf0 = None
    for i in range(R):
        Af, wf, uf, _ = run_fused(keys[i])
        Ax, wx, _, _ = run_staged(keys[i])
        if i == 0:
            uf0 = (np.asarray(uf), np.asarray(wf))
        Af_s += np.asarray(Af)
        Ax_s += np.asarray(Ax)
        wf = np.asarray(wf)
        wx = np.asarray(wx)
        wf_s = wf_s + wf
        wx_s = wx_s + wx
        wf2 = wf2 + wf * wf
        wx2 = wx2 + wx * wx

    # invariant: u is the residual of the NEW weights, exact up to the
    # bf16 omega stream rounding in the speed modes (the kernel scatters
    # with om16 while this identity divides by the f32 omega).
    u1, w1 = uf0
    psi_new = (np.asarray(ka) - u1) / np.asarray(om)
    psi_direct = np.asarray(d.Xf) @ w1
    rel = np.max(np.abs(psi_new - psi_direct)) / np.max(np.abs(psi_direct))
    assert rel < 5e-3, rel

    pf, px = Af_s / R, Ax_s / R
    pool = (pf + px) / 2
    se = np.sqrt(np.maximum(2 * pool * (1 - pool) / R, 1e-12)) + 1e-4
    zA = np.max(np.abs(pf - px) / se)
    # 576 simultaneous tests: Bonferroni 5.2 is a ~1e-4 family-wise level
    assert zA < 5.2, f"acceptance mismatch: max pooled |z| = {zA}"

    mf, mx = wf_s / R, wx_s / R
    vf = wf2 / R - mf * mf
    vx = wx2 / R - mx * mx
    sew = np.sqrt(np.maximum((vf + vx) / R, 0)) + 1e-6
    zw = np.max(np.abs(mf - mx) / sew)
    assert zw < 5.5, f"weight-mean mismatch: max |z| = {zw}"
