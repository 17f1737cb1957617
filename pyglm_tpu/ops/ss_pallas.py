"""Fully-fused spike-and-slab sweep kernel: Gram + residual update + the
per-edge collapsed Gibbs, in ONE Pallas pass over the data.

The residual-space update (models/weights.py resample_spike_slab_tspace)
pays, per presyn group g: one Gram accumulation stream of omega (the
separate gram kernel), one gather matmul M0 = Xg'u, and one scatter pass
u -= omega * (Xg dW) — each a full (T, N) stream, ~17 ms total at flagship
scale. This kernel restructures the whole update as a single pallas_call
with grid (Ng + 1, n_chunks), pipelined one group deep:

  step (g, t):  [t == 0: run the collapsed Gibbs EDGE SCAN for group g-1
                 in-kernel — Jgg/M0 for g-1 are complete, the dW it draws
                 is applied on the fly below]
                u_chunk -= omega_chunk * (X_{g-1} dW_{g-1})     (scatter)
                M0_g   += X_g' u_chunk                          (gather)
                Jgg_g  += sum_t X_g X_g' omega_chunk            (Gram)

so u, omega, and the design are each streamed ONCE per group (~260 MB vs
~430 MB), the Gram shares omega's stream with the scatter, and the ~200
sequential per-edge conditional draws run on VMEM-resident (B, N) rows with
no kernel-launch latency at all. The math is identical to
resample_spike_slab_tspace (reference: pyglm/regressions.py _resample_A_W —
same collapsed conditionals); only the execution schedule differs, and the
RNG stream is the in-kernel hardware PRNG instead of jax.random (parity is
statistical, as for the PG kernels — tests/test_ss_fused.py).

Precision: M0 and the scatter matmul run bf16x3 (~f32-grade, the same
manual splitting as ops/gram_pallas.py) in every mode; the Gram pass is
selected by `gram`:
  'bf16'   — one truncated-bf16 pass (precision='default'): ~8e-4 relative
             error, deterministic (a systematic bias of the stats).
  'sr'     — one STOCHASTICALLY-ROUNDED bf16 pass (precision='sr'): both
             operands are rounded to bf16 with probability proportional to
             the fractional distance (in-kernel PRNG bits added below the
             bf16 mantissa, then truncated), so every product is an
             unbiased estimate of the f32 product and the rounding errors
             are zero-mean and independent across the T contraction. The
             accumulated Gram entry is unbiased with relative noise
             ~2^-9/sqrt(T_eff) (~1e-5 at flagship T) — near-f32-grade
             statistics at single-pass MXU cost.
  'bf16x3' — three-pass bf16 emulation (~7e-7 relative, precision='high').

HBM streams: u + omega are re-read/written once per presyn group (~8
GB/sweep at flagship scale in f32). For gram in ('bf16', 'sr') omega
streams as bf16: omega is a FRESH continuous draw every sweep, so its
round-to-nearest storage error is zero-mean against the smooth PG
density (a sawtooth integrating to ~0) — no systematic bias, unlike
rounding the fixed design (measured −0.7 ms/sweep at flagship scale).
The kernels also accept a bf16 u stream generically by dtype (SR writes
via _sr16 to avoid error-feedback stagnation of sub-ulp scatter
corrections), but the library does NOT use it: the A/B measured the
kernel as pipeline-bound, so halving u's bytes saved ~0.5 ms while the
SR write ops plus the exact-psi recompute it forces in the sweep cost
~1.9 ms (BASELINE.md r3). 'bf16x3' keeps both streams f32.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PI = 3.141592653589793


def _uniform(shape):
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    u = pltpu.bitcast(bits >> 8, jnp.int32).astype(jnp.float32) * (
        1.0 / 16777216.0)
    return u + (1.0 / 33554432.0)


def _sr16(x):
    """Stochastic rounding f32 -> bf16: add PRNG bits below the bf16
    mantissa, then truncate (keep the top 16 bits of the IEEE pattern).
    Rounds to each bf16 neighbor with probability proportional to the
    fractional distance, so E[_sr16(x)] == x exactly; values already
    representable in bf16 are preserved. Validated on-chip: neighbors
    bounded, unbiased at z < 4 over 32k cells x 512 draws."""
    r, c = x.shape
    if r % 2 == 0:
        # both 16-bit halves of each 32-bit draw round one element each —
        # half the PRNG volume (arithmetic >> sign-fill is masked off)
        bits = pltpu.bitcast(pltpu.prng_random_bits((r // 2, c)), jnp.int32)
        rnd = jnp.concatenate([bits & jnp.int32(0xFFFF),
                               (bits >> 16) & jnp.int32(0xFFFF)], axis=0)
    else:
        rnd = pltpu.bitcast(pltpu.prng_random_bits((r, c)),
                            jnp.int32) & jnp.int32(0xFFFF)
    u = pltpu.bitcast(x, jnp.int32)
    u = (u + rnd) & jnp.int32(-65536)          # 0xFFFF0000
    return pltpu.bitcast(u, jnp.float32).astype(jnp.bfloat16)


def _normal_rows(n_rows, npad):
    """(n_rows, npad) standard normals from Box-Muller pairs."""
    assert n_rows % 2 == 0
    half = n_rows // 2
    u1 = _uniform((8 * ((half + 7) // 8), npad))
    u2 = _uniform((8 * ((half + 7) // 8), npad))
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    th = 2.0 * _PI * u2
    z1 = r * jnp.cos(th)
    z2 = r * jnp.sin(th)
    return jnp.concatenate([z1[:half], z2[:half]], axis=0)


def _mm(a, b):
    return lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32)


def _mm_t(a, b):
    """a (K, M), b (K, N) -> a' b (M, N)."""
    return lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32)


def _split3(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _mm3(a, b):
    """bf16x3 a @ b — ~f32-grade without Precision.HIGH (no Mosaic lowering)."""
    ahi, alo = _split3(a)
    bhi, blo = _split3(b)
    return _mm(ahi, bhi) + _mm(ahi, blo) + _mm(alo, bhi)


def _mm3_t(a, b):
    ahi, alo = _split3(a)
    bhi, blo = _split3(b)
    return _mm_t(ahi, bhi) + _mm_t(ahi, blo) + _mm_t(alo, bhi)


def _pair_offsets(G, B):
    """Row offsets of the packed upper block-triangle Gram: block (I, J)
    with I <= J stored as B*B rows (b-major) at offs[(I, J)]."""
    offs = {}
    r = 0
    for I in range(G):
        for J in range(I, G):
            offs[(I, J)] = r
            r += B * B
    return offs, r


def _edge_scan(G, B, npad, jgg, m0s, w_ref, mu_ref, lam_ref, lrho_ref,
               dw_ref, wout_ref, aout_ref):
    """The collapsed Gibbs over one group's G edges, unrolled (static i).

    All operands are (rows, npad) VMEM slabs with postsyn neurons on lanes:
      jgg  (n_packed, npad) completed within-group Gram, PACKED upper
           block-triangle (see _pair_offsets) — J[(IB+b),(JB+c)] for I <= J
           at row offs[(I,J)] + b*B + c; the lower triangle is read through
           the transposed block.
      m0s  (GB, npad)     completed gather X_g' u
      w_ref   (GB, npad)  current weights of the group (input block)
      mu_ref  (G*B, npad), lam_ref (G*B*B, npad), lrho_ref (G8, npad)
    Writes dw_ref (GB, npad) = w_new - w_old, wout_ref, aout_ref.

    Math identical to weights._batched_evidence + the edge body of
    resample_spike_slab_tspace; B-dimension unrolled as lane-parallel row
    algebra (each L[b][c] is one (npad,) row vector).
    """
    GB = G * B
    offs, _ = _pair_offsets(G, B)
    # dw still holds the PREVIOUS group's deltas (the scatter just consumed
    # them); this group's within-scan correction starts from zero.
    dw_ref[:, :] = jnp.zeros_like(dw_ref)

    def row(ref, r):
        return ref[r, :]

    def blk(I, J):
        """(B, B, npad) view of Gram block (I, J), any order of I, J."""
        if I <= J:
            o = offs[(I, J)]
            return jgg[o:o + B * B, :].reshape(B, B, npad)
        o = offs[(J, I)]
        return jgg[o:o + B * B, :].reshape(B, B, npad).transpose(1, 0, 2)

    for i in range(G):
        iB = i * B
        # --- linear term m[b] = M0[iB+b] - (Jrow dW)[b] + (Jii w_i)[b] ----
        dW = dw_ref[:, :]                                # (GB, npad)
        wi = [row(w_ref, iB + b) for b in range(B)]
        blk_ii = blk(i, i)
        Jii = [[blk_ii[b, c] for c in range(B)] for b in range(B)]
        m = []
        for b in range(B):
            corr = jnp.zeros((npad,), jnp.float32)
            for J in range(G):
                corr = corr + jnp.sum(
                    blk(i, J)[b] * dW[J * B:(J + 1) * B, :], axis=0)
            own = jnp.zeros((npad,), jnp.float32)
            for c in range(B):
                own = own + Jii[b][c] * wi[c]
            m.append(row(m0s, iB + b) - corr + own)

        mu0 = [row(mu_ref, iB + b) for b in range(B)]
        Lam0 = [[row(lam_ref, i * B * B + b * B + c) for c in range(B)]
                for b in range(B)]

        # --- chol of Lam0 (for logdet) and of Lp = Lam0 + Jii ------------
        def chol(A):
            L = [[None] * B for _ in range(B)]
            for j in range(B):
                s = A[j][j]
                for k in range(j):
                    s = s - L[j][k] * L[j][k]
                d = jnp.sqrt(jnp.maximum(s, 1e-30))
                L[j][j] = d
                inv_d = 1.0 / d
                for r in range(j + 1, B):
                    s2 = A[r][j]
                    for k in range(j):
                        s2 = s2 - L[r][k] * L[j][k]
                    L[r][j] = s2 * inv_d
            return L

        L0 = chol(Lam0)
        Lp = chol([[Lam0[b][c] + Jii[b][c] for c in range(B)]
                   for b in range(B)])

        ld0 = sum(jnp.log(L0[b][b]) for b in range(B))
        ldp = sum(jnp.log(Lp[b][b]) for b in range(B))

        # bpost = m + Lam0 mu0;  z = Lp^{-1} bpost  (forward solve)
        bpost = []
        for b in range(B):
            s = m[b]
            for c in range(B):
                s = s + Lam0[b][c] * mu0[c]
            bpost.append(s)
        z = [None] * B
        for b in range(B):
            s = bpost[b]
            for k in range(b):
                s = s - Lp[b][k] * z[k]
            z[b] = s / Lp[b][b]
        quad_p = 0.5 * sum(zz * zz for zz in z)
        quad_0 = jnp.zeros((npad,), jnp.float32)
        for b in range(B):
            for c in range(B):
                quad_0 = quad_0 + mu0[b] * Lam0[b][c] * mu0[c]
        quad_0 = 0.5 * quad_0

        log_odds = row(lrho_ref, i) + quad_p - quad_0 + ld0 - ldp
        # logistic via exp of the negative |x| branch (numerically safe)
        p_acc = 1.0 / (1.0 + jnp.exp(-log_odds))
        u_a = _uniform((8, npad))[0]
        a = jnp.where(u_a < p_acc, 1.0, 0.0)

        # posterior mean mu_p = Lp^{-T} z, draw = mu_p + Lp^{-T} eps
        eps_rows = _normal_rows(B if B % 2 == 0 else B + 1, npad)
        w_new = []
        # back-substitution for both z and eps in one pass
        tmp_mu = [None] * B
        tmp_ep = [None] * B
        for b in reversed(range(B)):
            s_mu = z[b]
            s_ep = eps_rows[b]
            for k in range(b + 1, B):
                s_mu = s_mu - Lp[k][b] * tmp_mu[k]
                s_ep = s_ep - Lp[k][b] * tmp_ep[k]
            tmp_mu[b] = s_mu / Lp[b][b]
            tmp_ep[b] = s_ep / Lp[b][b]
        for b in range(B):
            w_new.append(a * (tmp_mu[b] + tmp_ep[b]))

        for b in range(B):
            dw_ref[iB + b, :] = w_new[b] - wi[b]
            wout_ref[iB + b, :] = w_new[b]
        aout_ref[i, :] = a


def _make_kernel(Ng, G, B, npad, T, tc, gram):
    GB = G * B

    def kernel(seed_ref,
               xg_ref, xp_ref, om_ref, u_ref, w_ref, mu_ref, lam_ref,
               lrho_ref,
               uout_ref, wout_ref, aout_ref, sumom_ref,
               jgg, m0s, dw):
        g = pl.program_id(0)
        t = pl.program_id(1)

        @pl.when((g == 0) & (t == 0))
        def _():
            pltpu.prng_seed(seed_ref[0], seed_ref[1])
            sumom_ref[:] = jnp.zeros_like(sumom_ref)
            dw[:, :] = jnp.zeros_like(dw)

        # ---- group boundary: edge scan for group g-1 --------------------
        @pl.when((t == 0) & (g > 0))
        def _():
            _edge_scan(G, B, npad, jgg[:, :], m0s[:, :], w_ref, mu_ref,
                       lam_ref, lrho_ref, dw, wout_ref, aout_ref)

        @pl.when(t == 0)
        def _():
            # fresh accumulators for group g (scan above consumed g-1's)
            jgg[:, :] = jnp.zeros_like(jgg)
            m0s[:, :] = jnp.zeros_like(m0s)

        om_raw = om_ref[:]                               # (tc, npad)
        om32 = om_raw.astype(jnp.float32)
        u_sr = uout_ref.dtype == jnp.bfloat16            # 'sr' u stream

        # ---- apply group g-1's dW to this chunk (scatter); dw == 0 at
        # g == 0, so this is the identity there and uout is always written.
        xp = xp_ref[:]                                   # (GB, tc)
        if T % tc != 0:
            colp = lax.broadcasted_iota(jnp.int32, xp.shape, 1) + t * tc
            xp = jnp.where(colp < T, xp, 0.0)
        u_new = u_ref[:].astype(jnp.float32) - om32 * _mm3_t(xp, dw[:, :])
        uout_ref[:] = _sr16(u_new) if u_sr else u_new

        # ---- accumulate M0 / Jgg for group g (skip on the epilogue) -----
        @pl.when(g < Ng)
        def _():
            xg = xg_ref[:]                               # (GB, tc)
            if T % tc != 0:
                col = lax.broadcasted_iota(jnp.int32, xg.shape, 1) + t * tc
                xg = jnp.where(col < T, xg, 0.0)
            m0s[:, :] += _mm3(xg, u_new)
            # packed upper block-triangle Z: half the MXU rows of the
            # full (GB*GB) expansion, all slabs B*B-row aligned
            pieces = []
            for I in range(G):
                xI = xg[I * B:(I + 1) * B, :]
                for J in range(I, G):
                    xJ = xg[J * B:(J + 1) * B, :]
                    pieces.append(
                        (xI[:, None, :] * xJ[None, :, :]).reshape(B * B, tc))
            Z = jnp.concatenate(pieces, axis=0)
            if gram == "bf16":
                # om_raw is already the bf16 stream (see module docstring)
                jgg[:, :] += _mm(Z.astype(jnp.bfloat16), om_raw)
            elif gram == "sr":
                jgg[:, :] += _mm(_sr16(Z), om_raw)
            else:
                jgg[:, :] += _mm3(Z, om32)

            @pl.when(g == 0)
            def _():
                sumom_ref[0, :] += jnp.sum(om32, axis=0)

    return kernel


@partial(jax.jit, static_argnames=("B", "G", "t_chunk", "gram"))
def resample_spike_slab_fused(key, Xt, omega, kappa, psi, w_nb, hyp_mu,
                              hyp_lam, hyp_lrho, B: int, G: int,
                              t_chunk: int = 512, gram: str = "bf16x3"):
    """One fused pass of the grouped collapsed spike-and-slab update.

    Args:
      Xt: (P, T) transposed design (only the first N_pre*B rows are used).
      omega, kappa, psi: (T, N).
      w_nb: (N_pre*B, N) current non-bias weights (packed, presyn-major).
      hyp_mu: (N_pre, N, B); hyp_lam: (N_pre, N, B, B); hyp_lrho: (N_pre, N).
    Returns (A (N_pre, N), w_nb_new, u (T, N), sum_om (N,)) — the bias
    column update stays with the caller (it needs sum(u) after this pass).
    """
    assert gram in ("bf16", "sr", "bf16x3"), gram
    P, T = Xt.shape
    N = omega.shape[1]
    # N_pre from the packed weight rows, NOT P // B: with B == 1 the design's
    # trailing bias row would be miscounted as a presyn row (advisor r2).
    assert w_nb.shape[0] % B == 0, w_nb.shape
    N_pre = w_nb.shape[0] // B
    assert N_pre % G == 0
    Ng = N_pre // G
    GB = G * B
    npad = -(-N // 128) * 128
    tc = t_chunk
    # Pipelining hazard (advisor r2, medium): u is an ALIASED in/out pair
    # whose block index (t, 0) repeats every group. With n_chunks == 1 the
    # index never changes, so Pallas skips the re-fetch/flush entirely and
    # groups g >= 2 would read a residual missing earlier groups' scatter
    # updates; with n_chunks == 2 the flush of block 0 and its next-group
    # prefetch land in the same pipeline step. Clamp the chunk size so the
    # time axis always has >= 3 grid steps. tc must stay a multiple of 128
    # (Mosaic lane tiling of the unpadded design blocks), so callers gate
    # on T >= 384.
    if -(-T // tc) < 4:
        tc = max(128, (-(-T // 4) + 127) // 128 * 128)
    n_chunks = -(-T // tc)
    assert n_chunks >= 3, (T, tc)
    pad_t = n_chunks * tc - T
    pad_n = npad - N

    # Stream formats (module docstring): omega bf16 for the speed modes —
    # the RTN cast of a fresh continuous draw is zero-mean; all downstream
    # algebra (u0 here, the in-kernel scatter, sum_om) uses the SAME
    # rounded value, so the residual recursion stays self-consistent.
    # (A bf16 u stream with SR writes was A/B-tested and is NET-NEGATIVE:
    # the kernel is pipeline-bound, so halving u's bytes saved ~0.5 ms
    # while the SR write ops and the psi recompute it forces cost ~1.9 —
    # BASELINE.md r3. u stays f32; the kernels still handle a bf16 u
    # generically by dtype if that trade ever flips on other hardware.)
    if gram in ("bf16", "sr"):
        omega = omega.astype(jnp.bfloat16)
    u0 = kappa - omega.astype(jnp.float32) * psi
    u0 = jnp.pad(u0, ((0, pad_t), (0, pad_n)))
    om = jnp.pad(omega, ((0, pad_t), (0, pad_n)))
    w0 = jnp.pad(w_nb, ((0, 0), (0, pad_n)))
    # hypers to lane-major slabs; pad lanes of Lam with IDENTITY so the
    # in-kernel cholesky stays NaN-free there (outputs are sliced to N).
    mu_rows = hyp_mu.transpose(0, 2, 1).reshape(N_pre * B, N)
    mu_rows = jnp.pad(mu_rows, ((0, 0), (0, pad_n)))
    lam_rows = hyp_lam.transpose(0, 2, 3, 1).reshape(N_pre * B * B, N)
    eye_col = jnp.tile(jnp.eye(B, dtype=jnp.float32).reshape(B * B, 1),
                       (N_pre, 1))
    lam_rows = jnp.concatenate(
        [lam_rows, jnp.broadcast_to(eye_col, (N_pre * B * B, pad_n))], axis=1)
    # lrho / A are G rows per group; pad each group's slab to a multiple
    # of 8 sublanes (G is only guaranteed to make G*B a multiple of 8).
    G8 = -(-G // 8) * 8
    lrho_rows = jnp.pad(hyp_lrho.reshape(Ng, G, N),
                        ((0, 0), (0, G8 - G), (0, pad_n))
                        ).reshape(Ng * G8, npad)

    seed = jax.random.key_data(key).astype(jnp.uint32)[:2].astype(jnp.int32)
    kernel = _make_kernel(Ng, G, B, npad, T, tc, gram)

    def ix_g(g, t):
        return (jnp.minimum(g, Ng - 1), t)

    def ix_prev(g, t):
        return (jnp.maximum(g - 1, 0), t)

    def ix_prev_g(g, t):
        return (jnp.maximum(g - 1, 0), 0)

    u_out, w_out, a_out, sumom = pl.pallas_call(
        kernel,
        grid=(Ng + 1, n_chunks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((GB, tc), ix_g, memory_space=pltpu.VMEM),
            pl.BlockSpec((GB, tc), ix_prev, memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, npad), lambda g, t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, npad), lambda g, t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GB, npad), ix_prev_g, memory_space=pltpu.VMEM),
            pl.BlockSpec((GB, npad), ix_prev_g, memory_space=pltpu.VMEM),
            pl.BlockSpec((G * B * B, npad), ix_prev_g,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G8, npad), ix_prev_g, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tc, npad), lambda g, t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GB, npad), ix_prev_g, memory_space=pltpu.VMEM),
            pl.BlockSpec((G8, npad), ix_prev_g, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, npad), lambda g, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_chunks * tc, npad), u0.dtype),
            jax.ShapeDtypeStruct((N_pre * B, npad), jnp.float32),
            jax.ShapeDtypeStruct((Ng * G8, npad), jnp.float32),
            jax.ShapeDtypeStruct((8, npad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((G * (G + 1) // 2 * B * B, npad), jnp.float32),
            pltpu.VMEM((GB, npad), jnp.float32),
            pltpu.VMEM((GB, npad), jnp.float32),
        ],
        input_output_aliases={4: 0},      # u0 buffer reused as u output
    )(seed, Xt, Xt, om, u0, w0, mu_rows, lam_rows, lrho_rows)

    u = u_out[:T, :N]
    w_new = w_out[:, :N]
    A = a_out.reshape(Ng, G8, npad)[:, :G, :N].reshape(N_pre, N)
    sum_om = sumom[0, :N]
    return A, w_new, u, sum_om


# ---------------------------------------------------------------------------
# Per-group fused pass — the local, per-device piece of the MESH-sharded
# spike-and-slab update (models/weights.py _ss_fused_shard_map). The
# monolithic kernel above needs the full time axis resident on one device
# (its in-kernel edge scan consumes globally-complete Jgg/M0); under a
# ('time','neuron') mesh those stats must psum over time between a group's
# accumulation and its edge scan, so the sweep becomes a lax.scan over
# groups whose body runs THIS kernel per time shard. The streaming fusion
# is retained per shard: u, omega, and the two design groups are each
# touched once per group.
# ---------------------------------------------------------------------------


def ss_group_pass_tc(T: int, t_chunk: int = 512) -> int:
    """Chunk size used by ss_group_pass_pallas for a length-T time axis —
    callers pad omega/u to ``ceil(T / tc) * tc`` rows with this tc."""
    tc = t_chunk if T > t_chunk else T
    if T > tc:
        tc = max(128, tc // 128 * 128)   # Mosaic lane tiling of Xg blocks
    return tc


def _make_group_pass_kernel(T, tc, gram):
    def kernel(seed_ref, xp_ref, xg_ref, om_ref, u_ref, dw_ref,
               uout_ref, m0_ref, jgg_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            if gram == "sr":
                pltpu.prng_seed(seed_ref[0], seed_ref[1])
            m0_ref[:] = jnp.zeros_like(m0_ref)
            jgg_ref[:] = jnp.zeros_like(jgg_ref)

        om_raw = om_ref[:]                               # (tc, npad)
        om32 = om_raw.astype(jnp.float32)
        om16 = (om_raw if om_raw.dtype == jnp.bfloat16
                else om_raw.astype(jnp.bfloat16))
        u_sr = uout_ref.dtype == jnp.bfloat16            # 'sr' u stream
        xp = xp_ref[:]                                   # (GB, tc)
        if T % tc != 0:
            colp = lax.broadcasted_iota(jnp.int32, xp.shape, 1) + t * tc
            xp = jnp.where(colp < T, xp, 0.0)
        u_new = (u_ref[:].astype(jnp.float32)
                 - om32 * _mm3_t(xp, dw_ref[:]))         # scatter prev dW
        uout_ref[:] = _sr16(u_new) if u_sr else u_new
        xg = xg_ref[:]
        if T % tc != 0:
            col = lax.broadcasted_iota(jnp.int32, xg.shape, 1) + t * tc
            xg = jnp.where(col < T, xg, 0.0)
        m0_ref[:] += _mm3(xg, u_new)                     # gather
        GB = xg.shape[0]
        Z = (xg[:, None, :] * xg[None, :, :]).reshape(GB * GB, tc)
        if gram == "bf16":
            jgg_ref[:] += _mm(Z.astype(jnp.bfloat16), om16)
        elif gram == "sr":
            jgg_ref[:] += _mm(_sr16(Z), om16)
        else:
            jgg_ref[:] += _mm3(Z, om32)

    return kernel


@partial(jax.jit, static_argnames=("T", "t_chunk", "gram"))
def ss_group_pass_pallas(Xp, Xg, omega_pad, u_pad, dW_pad, T: int,
                         t_chunk: int = 512, gram: str = "bf16x3",
                         seed=None):
    """One fused scatter + gather + Gram pass over a presyn group:

        u    -= omega * (Xp' dW)        (apply the PREVIOUS group's draws)
        M0    = Xg u                    (gather for the current group)
        Jgg   = Xg diag(omega) Xg'      (within-group Gram)

    Args:
      Xp, Xg: (GB, T) previous / current group design rows (NOT padded;
        partial edge chunk masked in-kernel like the monolithic kernel).
      omega_pad, u_pad: (Tpad, npad) zero-padded to the chunk boundary and
        the 128-lane boundary. For the speed modes callers SHOULD pass
        omega_pad in bf16 (and, for gram='sr', u_pad in bf16) — the
        kernel is stream-bound, and it upcasts in VMEM (module
        docstring); f32 inputs are accepted and keep full-width streams.
      dW_pad: (GB, npad).
      gram: Gram precision mode — 'bf16' | 'sr' | 'bf16x3' (see module
        docstring). 'sr' requires `seed`, a (2,) int32 PRNG seed (e.g.
        ``jax.random.key_data(key)[:2]``) for the in-kernel rounding bits
        (shared by the Gram SR and the SR u-writes).
    Returns (u_new (Tpad, npad), M0 (GB, npad), Jgg (GB*GB, npad)).
    u_pad is aliased into u_new; every block is visited exactly once, so the
    monolithic kernel's revisit hazard cannot arise here.
    """
    assert gram in ("bf16", "sr", "bf16x3"), gram
    GB = Xg.shape[0]
    Tpad, npad = u_pad.shape
    tc = ss_group_pass_tc(T, t_chunk)
    n_chunks = -(-T // tc)
    assert Tpad == n_chunks * tc, (Tpad, T, tc)
    if seed is None:
        assert gram != "sr", "gram='sr' needs an explicit PRNG seed"
        seed = jnp.zeros((2,), jnp.int32)
    seed = jnp.asarray(seed, jnp.int32)

    kernel = _make_group_pass_kernel(T, tc, gram)
    u_new, M0, Jgg = pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((GB, tc), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((GB, tc), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, npad), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, npad), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GB, npad), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tc, npad), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GB, npad), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GB * GB, npad), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tpad, npad), u_pad.dtype),
            jax.ShapeDtypeStruct((GB, npad), jnp.float32),
            jax.ShapeDtypeStruct((GB * GB, npad), jnp.float32),
        ],
        input_output_aliases={4: 0},
    )(seed, Xp, Xg, omega_pad, u_pad, dW_pad)
    return u_new, M0, Jgg
