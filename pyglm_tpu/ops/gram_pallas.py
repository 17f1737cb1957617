"""Fused Pallas kernel for the omega-weighted group-Gram blocks.

The XLA path (models/weights.py group_gram_blocks) materializes the
Z[t, (p,q)] = X[t,p] X[t,q] expansion in HBM (~13 GB of traffic per flagship
sweep). This kernel forms Z in VMEM per (group, time-chunk) tile and feeds
the MXU directly, accumulating the (GB^2, N) output block across the
time-chunk grid dimension.

Layout notes (Mosaic tiling): the design matrix is consumed TRANSPOSED,
(P, T), so a group's GB columns sit on the sublane axis — GB must be a
multiple of 8 (use group sizes like 2, 4, 8, 16 with B=4). The postsyn axis
is padded to a multiple of 128 lanes.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mm(a_, b_):
    return jax.lax.dot_general(
        a_, b_, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _load_x(xt_ref, om_ref, T):
    """Load the chunk's design block, zeroing the partial edge block.

    The design is NOT time-padded (that would copy 320 MB per sweep at
    flagship scale); the edge block's out-of-range lanes contain undefined
    VMEM data, so they are where-masked to exact zeros. Omega IS padded
    (zeros) to the chunk boundary by the caller, so 0 * 0 = 0 keeps the
    accumulated Gram exact."""
    t = pl.program_id(2)
    tc = om_ref.shape[0]
    x = xt_ref[:]
    if T is not None and T % tc != 0:
        col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1) + t * tc
        x = jnp.where(col < T, x, 0.0)
    return x


def _gram_kernel_fast(xt_ref, om_ref, out_ref, *, T=None):
    """Single bf16 MXU pass: ~8e-4 relative error on the stats. This is the
    opt-in speed mode (model precision='default'); statistically validated
    against the f32 path in the acceptance harness, but not bitwise-f32."""
    t = pl.program_id(2)

    @pl.when(t == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    x = _load_x(xt_ref, om_ref, T)
    GB, tc = x.shape
    Z = (x[:, None, :] * x[None, :, :]).reshape(GB * GB, tc)
    out_ref[0] += _mm(Z, om_ref[:])


def _gram_kernel_f32(xt_ref, om_ref, out_ref, *, T=None):
    """Manual bf16x3 (~f32-accurate; Mosaic has no HIGH lowering)."""
    t = pl.program_id(2)

    @pl.when(t == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    x = _load_x(xt_ref, om_ref, T)
    GB, tc = x.shape
    Z = (x[:, None, :] * x[None, :, :]).reshape(GB * GB, tc)
    om = om_ref[:]
    Zhi = Z.astype(jnp.bfloat16)
    Zlo = (Z - Zhi.astype(jnp.float32)).astype(jnp.bfloat16)
    Ohi = om.astype(jnp.bfloat16)
    Olo = (om - Ohi.astype(jnp.float32)).astype(jnp.bfloat16)
    out_ref[0] += _mm(Zhi, Ohi) + _mm(Zhi, Olo) + _mm(Zlo, Ohi)


@partial(jax.jit, static_argnames=("B", "G", "t_chunk", "fast"))
def group_gram_blocks_pallas(Xf, omega, B: int, G: int, t_chunk: int = 512,
                             fast: bool = False):
    """Drop-in for group_gram_blocks on TPU: (Ng, N, GB, GB) blocks.
    Requires (G*B) % 8 == 0. fast=True: single-bf16-pass stats (~8e-4 rel)."""
    T, P = Xf.shape
    N_pre = (P - 1) // B
    n_chunks = -(-T // t_chunk)
    pad_t = n_chunks * t_chunk - T
    Xt = jnp.pad(Xf[:, : N_pre * B], ((0, pad_t), (0, 0))).T  # (P-1, Tpad)
    Op = jnp.pad(omega, ((0, pad_t), (0, 0)))
    return group_gram_blocks_pallas_t(Xt, Op, B, G, t_chunk=t_chunk,
                                      fast=fast)


@partial(jax.jit, static_argnames=("B", "G", "t_chunk", "fast", "n_pre"))
def group_gram_blocks_pallas_t(Xt, omega, B: int, G: int,
                               t_chunk: int | None = None,
                               fast: bool = False, n_pre: int | None = None):
    """Same as group_gram_blocks_pallas but consuming the TRANSPOSED design
    (P, T) or (N_pre*B, T) — the at-rest layout GLMData caches — so no
    per-sweep transpose of the 320 MB design.

    Pass ``n_pre`` when Xt carries a trailing bias row: P // B miscounts it
    as a presyn row when B == 1 (advisor r2)."""
    kernel = _gram_kernel_fast if fast else _gram_kernel_f32
    P, T = Xt.shape
    assert omega.shape[0] == T, (Xt.shape, omega.shape)
    # default: trailing bias row (if present, B >= 2) falls out of P // B
    N_pre = P // B if n_pre is None else n_pre
    assert N_pre % G == 0
    Ng = N_pre // G
    GB = G * B
    assert GB % 8 == 0, f"G*B={GB} must be a multiple of 8 for the kernel"
    N = omega.shape[1]
    if t_chunk is None:
        t_chunk = 512
    n_chunks = -(-T // t_chunk)
    pad_t = n_chunks * t_chunk - T
    # Lane (postsyn) axis tiling: at wide lane counts (lane-stacked
    # ensembles / tempering ladders, e.g. C*N = 4000) an untiled Npad blows
    # the ~16 MB scoped-VMEM limit (measured 66 MB at GB=40, Npad=4096).
    # Size Nblk from the measured VMEM model: the f32 out (GB^2, Nblk) and
    # omega (t_chunk, Nblk) blocks are DOUBLE-buffered by the pipeline
    # (8 bytes/elem), the kernel's bf16 omega copies add 4*t_chunk*Nblk,
    # and the lane-independent Z expansion (f32 + two bf16 copies) costs
    # ~8*GB^2*t_chunk. Budget 12 MB of the 16 MB scope. Flagship shapes
    # (N=200, GB=32) keep a single lane block — no change there. The
    # design block is re-streamed once per lane block — Gram FLOPs dominate
    # at the shapes where more than one block exists.
    budget = 12 * 2 ** 20 - 8 * GB * GB * t_chunk
    nb_fit = budget // (8 * GB * GB + 12 * t_chunk) // 128 * 128
    Nblk = max(128, min(-(-N // 128) * 128, nb_fit))
    n_nblk = -(-N // Nblk)
    Npad = n_nblk * Nblk
    # The design is NOT padded (no 320 MB copy): its partial edge block is
    # masked in-kernel, and its trailing bias row (P = N_pre*B + 1) sits in
    # sublane block index Ng which the grid never touches. Omega IS padded
    # to the chunk boundary (zeros) in the same cheap pad as its lane pad.
    Op = jnp.pad(omega, ((0, pad_t), (0, Npad - N)))

    out = pl.pallas_call(
        partial(kernel, T=T),
        grid=(Ng, n_nblk, n_chunks),
        in_specs=[
            pl.BlockSpec((GB, t_chunk), lambda g, n, t: (g, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t_chunk, Nblk), lambda g, n, t: (t, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, GB * GB, Nblk), lambda g, n, t: (g, 0, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Ng, GB * GB, Npad), jnp.float32),
    )(Xt, Op)
    out = out[:, :, :N].reshape(Ng, GB, GB, N)
    return out.transpose(0, 3, 1, 2)
