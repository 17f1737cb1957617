"""Fused Pallas TPU kernel for exact PG(1, c) draws (Devroye).

The XLA path (ops/polyagamma.py pg_devroye) round-trips ~10 full-size
temporaries through HBM per rejection round. This kernel keeps the whole
accept-reject state machine — proposal mixture, truncated-inverse-Gaussian
inner rejection, alternating-series test, in-kernel counter RNG — in VMEM
registers, so 20M draws cost one read + one write of the psi array plus VPU
compute. Unbiasedness: inner-loop exhaustion is treated as an outer-round
rejection (conditioning an iid rejection round on success-within-k preserves
the accepted value's law); residual failure after 8 outer rounds has
probability ~1e-25 per element and falls back to the conditional mean.

Replaces: pypolyagamma/cpp/PolyaGamma.cpp + the OpenMP fan-out in
pypolyagamma.pyx (pgdrawvpar) — per-thread GSL RNG state becomes the
per-core hardware PRNG seeded from the jax key and the grid position.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PI = 3.141592653589793
_T = 0.64
_INNER = 6          # trunc-IG iterations (3 Box-Muller pairs) per outer round
_NSERIES = 2        # series terms: a_2/a_0 < 4e-8 — invisible at f32
_ROUNDS = 2         # outer proposal rounds fused in ONE kernel (the setup
                    # — q/ratio/erf — is computed once, not per pass)
_LANES = 128
_BLK = 256          # sublanes per program: tile = (256, 128) = 32k draws


def _uniform(shape):
    """U(0,1) in (2^-25, 1) from hardware random bits.

    prng_random_bits returns *signed* int32 — bitcast to uint32 before
    shifting or half the draws go negative (log(neg) = NaN)."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    # Mosaic lacks uint32->f32; the top-24-bit value fits int32 exactly.
    u = pltpu.bitcast(bits >> 8, jnp.int32).astype(jnp.float32) * (
        1.0 / 16777216.0)
    return u + (1.0 / 33554432.0)


def _exponential(shape):
    return -jnp.log(_uniform(shape))


def _normal(shape):
    u1 = _uniform(shape)
    u2 = _uniform(shape)
    return jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(2.0 * _PI * u2)


def _erf(x):
    """Abramowitz–Stegun 7.1.26 polynomial erf (|err| < 1.5e-7) — Mosaic has
    no erf lowering; this accuracy keeps the proposal-mixture weights (and
    hence exactness of the rejection sampler) to ~1e-6."""
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
                + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _norm_cdf(x):
    return 0.5 * (1.0 + _erf(x * 0.7071067811865475))


def _log_coef(x, n):
    """log a_n(x) of the alternating series (see ops/polyagamma.py)."""
    half = n + 0.5
    xs = jnp.maximum(x, 1e-30)
    logl = (jnp.log(_PI * half) + 1.5 * (jnp.log(2.0 / _PI) - jnp.log(xs))
            - 2.0 * half * half / xs)
    logr = jnp.log(_PI * half) - half * half * _PI * _PI * xs / 2.0
    return jnp.where(x <= _T, logl, logr)


def _pg_kernel(seed_ref, psi_ref, out_ref, done_ref, *, rounds=_ROUNDS):
    # Distinct stream per grid program: mix the block index into the seed
    # words arithmetically (3-arg prng_seed miscompiles on this Mosaic).
    pid = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0] + pid * 1000003, seed_ref[1] + pid)
    shape = psi_ref.shape
    z = 0.5 * jnp.abs(psi_ref[:])

    K = _PI * _PI / 8.0 + 0.5 * z * z
    logp = jnp.log(_PI / (2.0 * K)) - K * _T
    sqt = jnp.sqrt(jnp.float32(_T))
    # q = 2[e^{-z} Phi((zt-1)/sqrt t) + e^{z} Phi(-(zt+1)/sqrt t)]; the
    # second term is evaluated in closed form to avoid exp(z)*underflow:
    # e^z Phi(-x) ~ exp(-z^2 t/2 - 1/(2t)) * (1/x - 1/x^3) / sqrt(2 pi).
    x2 = (z * _T + 1.0) / sqt
    t2_exact = jnp.exp(z) * _norm_cdf(-x2)
    t2_tail = (jnp.exp(-0.5 * z * z * _T - 1.0 / (2.0 * _T))
               * (1.0 / x2 - 1.0 / (x2 * x2 * x2))
               * jnp.float32(0.3989422804014327))
    term2 = jnp.where(x2 < 4.0, t2_exact, t2_tail)
    q = 2.0 * (jnp.exp(-z) * _norm_cdf((z * _T - 1.0) / sqt) + term2)
    p = jnp.exp(logp)
    ratio = p / (p + q)

    # Masks are f32 0/1 throughout — Mosaic has no i1 vector truncation.
    one = jnp.ones(shape, jnp.float32)
    zero = jnp.zeros(shape, jnp.float32)

    def m_where(cond_f, a, b):
        return cond_f * a + (1.0 - cond_f) * b

    zsafe = jnp.maximum(z, 1e-6)
    X0 = jnp.where(z < 1e-6, one, jnp.tanh(zsafe) / zsafe)  # fallback mean
    use_levy = jnp.where((z * _T) < 1.0, one, zero)
    mu = 1.0 / zsafe

    # ---- _ROUNDS fused proposal rounds (per-round acceptance ~0.997);
    # residual failures (~1e-5) are finished via compacted segment-argmax
    # extraction + a many-round single-block kernel. Fusing the rounds
    # amortizes the setup (q/ratio/erf) and the HBM round trip that a second
    # pallas pass would pay; a full fixed-budget loop would cost ~8x more.
    #
    # Transcendental budget (the kernel is VPU-transcendental-bound —
    # ~0.08 ns/elt per log/exp/cos): the trunc-IG iteration is run in PAIRS:
    #  * Levy lane: the two-stage test (E1^2 <= 2 E2/_T, then
    #    u <= exp(-z^2 XA/2)) is marginalized over E2 —
    #    P(E2 >= _T E1^2 / 2) = exp(-_T E1^2/2) — so one merged uniform test
    #    u <= exp(-(_T E1^2 + z^2 XA)/2) replaces E2's log entirely.
    #  * IG lane: the chi^2_1 variates for the two halves of a pair come
    #    from ONE Box-Muller radius: R^2 cos^2(th) and R^2 sin^2(th) are
    #    independent chi^2_1 (Z1, Z2 independent), and sin^2 = 1 - cos^2
    #    costs nothing. Squaring first also deletes the sqrt of |Z|.
    #  * The merged-accA uniform doubles as the takeB uniform — each element
    #    reads it for exactly one lane.
    # Net: ~4 transcendentals per trunc-IG iteration instead of 7.
    def inner_pair(_, carry):
        Xig, ig_done = carry
        r2 = 2.0 * _exponential(shape)          # Box-Muller R^2 = -2 log u
        cth = jnp.cos(2.0 * _PI * _uniform(shape))
        c2 = cth * cth
        for chi2 in (r2 * c2, r2 * (1.0 - c2)):
            E1 = _exponential(shape)
            d1 = 1.0 + _T * E1
            XA = _T / (d1 * d1)
            u = _uniform(shape)
            accA = jnp.where(
                u <= jnp.exp(-0.5 * (_T * E1 * E1 + z * z * XA)), one, zero)
            muY = mu * chi2
            XB0 = mu + 0.5 * mu * muY - 0.5 * mu * jnp.sqrt(
                4.0 * muY + muY * muY)
            XB0 = jnp.maximum(XB0, 1e-30)
            takeB = jnp.where(u <= mu / (mu + XB0), one, zero)
            # Clamp BEFORE the arithmetic mask: 0 * inf = NaN, and mu^2/XB0
            # overflows f32 when z ~ 0 (the Levy branch is taken there, but
            # the masked-out lane must still be finite).
            XBr = jnp.minimum(mu * mu / XB0, 1e30)
            XB = m_where(takeB, XB0, XBr)
            accB = jnp.where(XB <= _T, one, zero)
            Xn = m_where(use_levy, XA, XB)
            acc = m_where(use_levy, accA, accB) * (1.0 - ig_done)
            Xig = m_where(acc, Xn, Xig)
            ig_done = jnp.maximum(ig_done, acc)
        return Xig, ig_done

    Xout = X0
    done = zero
    for _ in range(rounds):
        branch_exp = jnp.where(_uniform(shape) < ratio, one, zero)
        Xexp = _T + _exponential(shape) / K
        Xig, ig_done = lax.fori_loop(0, _INNER // 2, inner_pair, (zero, zero))
        Xprop = m_where(branch_exp, Xexp, jnp.maximum(Xig, 1e-30))
        prop_ok = jnp.maximum(branch_exp, ig_done)

        # Alternating-series accept test against the n=1 lower bound,
        # normalized by a_0: U a_0 <= a_0 - a_1  <=>  U <= 1 - a_1/a_0, and
        # a_1/a_0 = 3 exp(-4/x) (x <= t) / 3 exp(-pi^2 x) (x > t) — ONE exp,
        # no log. The n=2 refinement never changes the decision (the
        # alternating bound used for acceptance is the odd partial sum;
        # a_2/a_0 < 4e-8 only tightens the unused upper bound), so the
        # accepted law is identical to the previous 3-term evaluation.
        xs = jnp.maximum(Xprop, 1e-30)
        w1 = jnp.where(Xprop <= _T, -4.0 / xs, -_PI * _PI * Xprop)
        ratio1 = 3.0 * jnp.exp(w1)
        acc = jnp.where(_uniform(shape) <= 1.0 - ratio1, one, zero) \
            * prop_ok * (1.0 - done)
        Xout = m_where(acc, Xprop, Xout)
        done = jnp.maximum(done, acc)

    out_ref[:] = 0.25 * Xout
    done_ref[:] = done


def _kernel_pass(key, flat, n_blk, rounds=_ROUNDS):
    seed = jax.random.key_data(key).astype(jnp.uint32)[:2].astype(jnp.int32)
    return pl.pallas_call(
        partial(_pg_kernel, rounds=rounds),
        grid=(n_blk,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((_BLK, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_BLK, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLK, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_blk * _BLK, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_blk * _BLK, _LANES), jnp.float32),
        ],
    )(seed, flat)


_SMALL_ROUNDS = 12      # straggler budget: residual ~ (1e-2)^12 per element


def _pg_draw_small(key, c):
    """Devroye draws for the (S,)-sized straggler arrays of the extraction
    finisher: one single-block Pallas call running _SMALL_ROUNDS proposal
    rounds (residual non-acceptance ~1e-24 per element falls back to the
    conditional mean, matching the documented fallback of the big pass).
    Replaces the XLA while-loop sampler here — on a few-thousand-element
    array its sequential accept-reject rounds are latency-bound and cost
    ~1.6 ms per extraction round; this kernel costs ~0.1 ms."""
    S = c.shape[0]
    rows = -(-S // _LANES)
    rows_p = -(-rows // 8) * 8                      # f32 min sublane tile
    flat = jnp.pad(c, (0, rows_p * _LANES - S)).reshape(rows_p, _LANES)
    seed = jax.random.key_data(key).astype(jnp.uint32)[:2].astype(jnp.int32)
    out, _ = pl.pallas_call(
        partial(_pg_kernel, rounds=_SMALL_ROUNDS),
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((rows_p, _LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((rows_p, _LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_p, _LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows_p, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows_p, _LANES), jnp.float32),
        ],
    )(seed, flat)
    return out.reshape(-1)[:S]


_SEG = 4096
_MAX_EXTRACT = 64


_EXTRACT_R = 5      # failure columns resolved per compacted segment/phase
_COMPACT_K = 1024   # failing segments gathered per phase


def _finish_by_extraction(key, arrs2, out2, fail2, draw_fn,
                          K_cap=None, R_cap=None):
    """Exact finisher for the last few-thousand stragglers.

    arrs2 is a tuple of (S, SEG) parameter arrays; out2/fail2 are (S, SEG).
    Touching the full (S, SEG) arrays once per straggler rank is what makes
    naive extraction cost ~1.5 ms/rank, so one phase works on a COMPACTED
    view: argsort the per-segment any-failure flags, gather the (at most)
    _COMPACT_K failing segments' rows, resolve the first _EXTRACT_R failure
    columns of each compacted row (argmax sweeps over the small view), redraw
    them all with ONE draw_fn call, and scatter the repaired rows back.
    Phases repeat (capped) until no failures remain — with the pass-1 budgets
    in this module, one phase clears everything with overwhelming
    probability; capacity overflow (more than K failing segments or more than
    R failures in one segment) simply rolls into the next phase."""
    S, SEG = out2.shape
    K = min(S, K_cap or _COMPACT_K)
    R = R_cap or _EXTRACT_R
    rows = jnp.arange(K)

    def cond(state):
        i, _, _, fail2 = state
        return (i < _MAX_EXTRACT) & jnp.any(fail2)

    def body(state):
        i, key, out2, fail2 = state
        key, k1 = jax.random.split(key)
        seg_any = jnp.any(fail2, axis=1)
        sel = jnp.argsort(~seg_any)[:K]           # failing segments first
        sub_fail = fail2[sel]                     # (K, SEG)
        sub_out = out2[sel]
        sub_arrs = tuple(a2[sel] for a2 in arrs2)

        idxs, hass = [], []
        for _ in range(R):
            arg = jnp.argmax(sub_fail, axis=1)    # (K,)
            idxs.append(arg)
            hass.append(sub_fail[rows, arg])
            sub_fail = sub_fail.at[rows, arg].set(False)
        idx = jnp.stack(idxs, axis=1)             # (K, R)
        has = jnp.stack(hass, axis=1)
        vals = tuple(jnp.take_along_axis(a2, idx, axis=1).reshape(-1)
                     for a2 in sub_arrs)
        draws = draw_fn(k1, *vals).reshape(K, R)
        # Exhausted ranks all report column argmax(False)=0 — scatter them
        # out of bounds (mode='drop') so a real draw at column 0 is never
        # raced by a stale duplicate write.
        idx_w = jnp.where(has, idx, SEG)
        sub_out = jax.vmap(
            lambda o, ix, u: o.at[ix].set(u, mode="drop"))(
                sub_out, idx_w, draws)
        out2 = out2.at[sel].set(sub_out)
        fail2 = fail2.at[sel].set(sub_fail)
        return i + 1, key, out2, fail2

    _, _, out2, _ = lax.while_loop(
        cond, body, (jnp.zeros((), jnp.int32), key, out2, fail2))
    return out2


@jax.jit
def pg_devroye_pallas(key, c):
    """Exact PG(1, c), elementwise over any-shaped c.

    One fused Pallas pass running _ROUNDS proposal rounds covers all but
    ~1e-5 of elements; the surviving stragglers — a few hundred out of
    20M — are finished by the exact XLA sampler via a segment-argmax
    extraction loop on an (n/4096)-sized array. Every stage draws from the
    exact distribution, so the composition is exact. (A full-array XLA
    continuation costs ~2.4x one kernel pass; jnp.nonzero compaction costs
    ~5x — hence this shape.)"""
    c = jnp.asarray(c, jnp.float32)
    shape = c.shape
    total = c.size
    per_blk = _BLK * _LANES
    n_blk = -(-total // per_blk)
    flat = jnp.pad(c.ravel(), (0, n_blk * per_blk - total))
    flat = flat.reshape(n_blk * _BLK, _LANES)
    k1, k3 = jax.random.split(key)

    # 2 fused rounds + compacted extraction measured best: a 1-round pass
    # with a beefier finisher loses ~14 ms to multi-phase extraction over
    # ~110k stragglers (0.55% round-1 failure).
    out, done = _kernel_pass(k1, flat, n_blk)
    fail = done < 0.5

    # Padding rows never count as failures.
    M = n_blk * _BLK * _LANES
    valid = (jnp.arange(M) < total).reshape(n_blk * _BLK, _LANES)
    fail = fail & valid

    S = -(-M // _SEG)
    c2 = flat.reshape(S, _SEG)
    out = _finish_by_extraction(
        k3, (c2,), out.reshape(S, _SEG), fail.reshape(S, _SEG),
        _pg_draw_small)
    return out.reshape(-1)[:total].reshape(shape)



def _tail_alpha_beta(b2, c2):
    """delta + Gamma(alpha)/beta parameters matching the first THREE
    moments of the k > _GAMMA_K series tail (XLA side: _tail_sums needs
    atan, which Mosaic lacks). The 2-moment gamma undershoots the tail's
    skewness (Cauchy-Schwarz: S2^2 <= S1 S3), so delta >= 0 and the match
    stays on positive support; the kernel draws Gamma(alpha)/beta and the
    caller adds delta post-kernel."""
    from pyglm_tpu.ops.polyagamma import _tail_sums
    bs = jnp.maximum(b2, 1e-6)
    a = jnp.abs(c2) / (2.0 * _PI)
    S1, S2, S3 = _tail_sums(a, _GAMMA_K)
    m_t = bs * S1 / (2.0 * _PI * _PI)
    v_t = bs * S2 / (4.0 * _PI ** 4)
    mu3_t = 2.0 * bs * S3 / (2.0 * _PI * _PI) ** 3
    beta = 2.0 * v_t / jnp.maximum(mu3_t, 1e-30)
    alpha = v_t * beta * beta
    delta = jnp.maximum(m_t - alpha / beta, 0.0)
    return alpha, beta, delta


_GAMMA_SMALL_ROUNDS = 8     # straggler budget: residual miss ~6e-10/elt


def _pg_gamma_draw_small(key, b, c):
    """Gamma-series PG draws for the straggler arrays of the extraction
    finisher: one single-block kernel call with _GAMMA_SMALL_ROUNDS
    Marsaglia-Tsang rounds per term (residual per-element miss ~6e-10 —
    those keep their truncated value, the same negligible-fallback policy
    as the Devroye finisher). The moment-matched tail (gamma in-kernel +
    3rd-moment shift delta here) is added too, so a finished element's law
    matches the main path's."""
    S = b.shape[0]
    rows = -(-S // _LANES)
    # Tile rows so the kernel fits scoped VMEM at ANY straggler count:
    # the compaction finisher calls this at F_cap ~ M/64 elements, far
    # beyond the single-block sizes the segment finisher used.
    blk = min(_BLK, -(-rows // 8) * 8)
    rows_p = -(-rows // blk) * blk
    pad = rows_p * _LANES - S
    b2 = jnp.pad(b, (0, pad), constant_values=1.0).reshape(rows_p, _LANES)
    c2 = jnp.pad(c, (0, pad)).reshape(rows_p, _LANES)
    alpha, beta, delta = _tail_alpha_beta(b2, c2)
    seed = jax.random.key_data(key).astype(jnp.uint32)[:2].astype(jnp.int32)
    spec = pl.BlockSpec((blk, _LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    out, _ = pl.pallas_call(
        partial(_pg_gamma_kernel, rounds=_GAMMA_SMALL_ROUNDS),
        grid=(rows_p // blk,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [spec] * 4,
        out_specs=[spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct((rows_p, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows_p, _LANES), jnp.float32),
        ],
    )(seed, b2, c2, alpha, beta)
    return (out + delta).reshape(-1)[:S]


# ---------------------------------------------------------------------------
# Gamma-series PG(b, c) kernel (general real b — the NB path's hot loop)
# ---------------------------------------------------------------------------

_GAMMA_K = 4        # series terms drawn in-kernel; KS-indistinguishable
                    # from K=128 AND from the exact native b-fold Devroye
                    # convolution at n=200k across b in {1..130} x c in
                    # {0, 1.5, 6, 30} (benchmarks/k8_study.py --K 4,6;
                    # gated by tests/test_polyagamma.py and the on-chip
                    # suite) — the tail match absorbs terms k>K. What
                    # made K=4 (r3 shipped 8) safe is the THREE-moment
                    # shifted-gamma tail: at K=4 the tail's variance share
                    # is ~5e-4 and a 2-moment match's third-cumulant
                    # mismatch would surface at n=200k; matching mu3 (and
                    # the Euler-Maclaurin-corrected S1..S3 sums) keeps the
                    # whole grid at KS < 0.006 vs thr 0.00704
_GAMMA_R = 2        # Marsaglia-Tsang rounds per series pair-draw. With the
                    # shared proposal stream inside each pair (see
                    # series_pair) a pair fails only when fewer than 2 of
                    # its 2*_GAMMA_R proposals accept (~4p^3 at per-proposal
                    # rejection p ~ 0.01-0.04), so the element straggler
                    # rate stays ~2e-5 — the same few-hundred-per-20M regime
                    # _GAMMA_R=3 unshared gave — while the main pass drops
                    # 27.5 -> ~12 ms/20M (the 3rd round's transcendentals
                    # were ~60% of kernel time at near-zero acceptance
                    # yield). The tail draw runs _GAMMA_R+1 solo rounds.


def _pg_gamma_kernel(seed_ref, b_ref, c_ref, alpha_ref, beta_ref,
                     out_ref, done_ref, *, rounds=_GAMMA_R):
    """Truncated gamma-series sum: out = (1/2pi^2) sum_k Gamma(b)/d_k.

    Gamma(b) via Marsaglia-Tsang with fixed _GAMMA_R rounds (accept ~0.96+
    per round); b < 1 handled by the Gamma(b+1) U^{1/b} boost. done=0 marks
    elements where any of the K draws exhausted its budget — those are
    redrawn exactly by the caller. The moment-matched tail term is added by
    the caller (it needs atan, which Mosaic lacks)."""
    pid = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0] + pid * 1000003, seed_ref[1] + pid)
    shape = b_ref.shape
    one = jnp.ones(shape, jnp.float32)
    zero = jnp.zeros(shape, jnp.float32)

    b = jnp.maximum(b_ref[:], 1e-6)
    small = jnp.where(b < 1.0, one, zero)
    bb = b + small                       # MT shape >= 1
    d = bb - 1.0 / 3.0
    cmt = 1.0 / (3.0 * jnp.sqrt(d))
    inv_b = 1.0 / b
    a = jnp.abs(c_ref[:]) / (2.0 * _PI)
    a2 = a * a

    def mt_step(x, g, ok, d_=None, cmt_=None):
        """One Marsaglia-Tsang accept-reject round at proposal normal x."""
        dd = d if d_ is None else d_
        cc = cmt if cmt_ is None else cmt_
        v0 = 1.0 + cc * x
        v = v0 * v0 * v0
        pos = jnp.where(v0 > 0.0, one, zero)
        vs = jnp.maximum(v, 1e-30)
        logu = jnp.log(_uniform(shape))
        acc = pos * jnp.where(
            logu < 0.5 * x * x + dd - dd * vs + dd * jnp.log(vs), one, zero)
        g = g + acc * (1.0 - ok) * dd * vs
        return g, jnp.maximum(ok, acc)

    def accept_val(x):
        """One MT accept-reject test at proposal normal x: returns the
        0/1 acceptance mask and the gamma value d*v it carries."""
        v0 = 1.0 + cmt * x
        v = v0 * v0 * v0
        pos = jnp.where(v0 > 0.0, one, zero)
        vs = jnp.maximum(v, 1e-30)
        logu = jnp.log(_uniform(shape))
        acc = pos * jnp.where(
            logu < 0.5 * x * x + d - d * vs + d * jnp.log(vs), one, zero)
        return acc, d * vs

    def series_pair(j, carry):
        """TWO consecutive series terms; each round's two proposal normals
        come from ONE Box-Muller radius: (R cos th, R |sin th| S) with an
        independent fair sign S has the same joint law as (R cos th,
        R sin th) — conditional on cos th, the sign of sin th is an
        independent fair coin — so both gammas stay exact while the
        radius log/sqrt is paid once per round instead of twice.

        The pair's two draws SHARE the proposal stream: both are iid
        Gamma(bb) with the same shape, so the accepted proposals form one
        iid gamma stream and the first two accepted values go to gA then
        gB (the assignment depends only on the acceptance history, never
        on the values, so gA, gB stay exact iid draws). This drops the
        pair failure rate from ~2p^2 to ~4p^3 per 2-round budget
        (p ~ 0.01-0.04 per-proposal rejection), which is what lets
        _GAMMA_R=2 keep straggler counts inside the segment finisher's
        cheap regime."""
        s, all_ok = carry
        gA = zero
        okA = zero
        gB = zero
        okB = zero
        for _ in range(rounds):
            rad = jnp.sqrt(2.0 * _exponential(shape))
            cth = jnp.cos(2.0 * _PI * _uniform(shape))
            sth = jnp.sqrt(jnp.maximum(1.0 - cth * cth, 0.0))
            sgn = jnp.where(_uniform(shape) < 0.5, -1.0, 1.0)
            for x in (rad * cth, rad * sth * sgn):
                acc, val = accept_val(x)
                takeA = acc * (1.0 - okA)
                gA = gA + takeA * val
                okA = jnp.maximum(okA, takeA)
                takeB = acc * (1.0 - takeA) * (1.0 - okB)
                gB = gB + takeB * val
                okB = jnp.maximum(okB, takeB)
        # b < 1 boost: Gamma(b) = Gamma(b+1) * U^(1/b)
        boostA = jnp.exp(jnp.log(_uniform(shape)) * inv_b)
        boostB = jnp.exp(jnp.log(_uniform(shape)) * inv_b)
        scaleA = small * boostA + (1.0 - small)
        scaleB = small * boostB + (1.0 - small)
        kA = 2.0 * j.astype(jnp.float32) + 1.0
        kB = kA + 1.0
        dkA = (kA - 0.5) * (kA - 0.5) + a2
        dkB = (kB - 0.5) * (kB - 0.5) + a2
        s = s + gA * scaleA / dkA + gB * scaleB / dkB
        return s, all_ok * okA * okB

    assert _GAMMA_K % 2 == 0
    s, all_ok = lax.fori_loop(0, _GAMMA_K // 2, series_pair, (zero, one))

    # Moment-matched tail (terms k > K) as ONE more in-kernel MT gamma:
    # jax.random.gamma on a 20M-element array costs ~300 ms in XLA (its
    # while-loop rejection sampler round-trips HBM per round); here it is
    # one extra series term. alpha/beta come precomputed from the caller
    # (their S1/S2 need atan, which Mosaic lacks).
    al = jnp.maximum(alpha_ref[:], 1e-6)
    small_t = jnp.where(al < 1.0, one, zero)
    bb_t = al + small_t
    d_t = bb_t - 1.0 / 3.0
    cmt_t = 1.0 / (3.0 * jnp.sqrt(d_t))
    g_t = zero
    ok_t = zero
    # The tail draw has its own shape (alpha), so it cannot share the
    # series pairs' proposal stream — give it one extra round instead to
    # keep its solo failure rate ~p^3, matching the shared pairs'.
    for _ in range(rounds + 1):
        x = _normal(shape)
        g_t, ok_t = mt_step(x, g_t, ok_t, d_=d_t, cmt_=cmt_t)
    boost_t = jnp.exp(jnp.log(_uniform(shape)) / al)
    g_t = g_t * (small_t * boost_t + (1.0 - small_t))

    out_ref[:] = s / (2.0 * _PI * _PI) + g_t / beta_ref[:]
    done_ref[:] = all_ok * ok_t


@partial(jax.jit, static_argnames=("K",))
def pg_gamma_series_pallas(key, b, c, K: int = _GAMMA_K):
    """PG(b, c) for arbitrary real b > 0: fused in-kernel gamma series +
    XLA moment-matched tail; stragglers finished exactly (same two-stage
    shape as pg_devroye_pallas). K is fixed at the kernel's _GAMMA_K."""

    assert K == _GAMMA_K, f"kernel compiled for K={_GAMMA_K}"
    b = jnp.asarray(b, jnp.float32)
    c = jnp.asarray(c, jnp.float32)
    shape = jnp.broadcast_shapes(b.shape, c.shape)
    b = jnp.broadcast_to(b, shape)
    c = jnp.broadcast_to(c, shape)
    total = b.size
    per_blk = _BLK * _LANES
    n_blk = -(-total // per_blk)
    padn = n_blk * per_blk - total
    bflat = jnp.pad(b.ravel(), (0, padn), constant_values=1.0)
    cflat = jnp.pad(c.ravel(), (0, padn))
    b2d = bflat.reshape(n_blk * _BLK, _LANES)
    c2d = cflat.reshape(n_blk * _BLK, _LANES)
    k1, k2 = jax.random.split(key)

    alpha2d, beta2d, delta2d = _tail_alpha_beta(b2d, c2d)

    def gamma_pass(kk):
        seed = jax.random.key_data(kk).astype(jnp.uint32)[:2].astype(jnp.int32)
        spec = pl.BlockSpec((_BLK, _LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            _pg_gamma_kernel,
            grid=(n_blk,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [spec] * 4,
            out_specs=[spec, spec],
            out_shape=[
                jax.ShapeDtypeStruct((n_blk * _BLK, _LANES), jnp.float32),
                jax.ShapeDtypeStruct((n_blk * _BLK, _LANES), jnp.float32),
            ],
        )(seed, b2d, c2d, alpha2d, beta2d)

    series, done1 = gamma_pass(k1)
    fail = done1 < 0.5
    M = n_blk * per_blk
    valid = (jnp.arange(M) < total).reshape(n_blk * _BLK, _LANES)
    fail = fail & valid

    # tail gamma is drawn in-kernel; its 3rd-moment shift delta is added
    # here (the finisher's redraws add their own delta inside
    # _pg_gamma_draw_small, so replaced elements stay consistent)
    out = series + delta2d

    # The 2-round shared-proposal main pass leaves ~2e-5 of elements
    # unresolved (one of their K gamma draws exhausted its budget) — a
    # SECOND full pass would cost another main-kernel launch for a few
    # hundred elements, so they are finished by the compacted extraction
    # with a many-round gamma kernel (k2 keys the redraws). NOTE: at this
    # rate failures land in ~400 distinct segments per 20M draws, so
    # K_cap=1024 gathers every failing segment in one phase while keeping
    # the gather at ~1/5 of the array; straggler-rate regressions roll
    # into extra phases, exactly.
    S = -(-M // _SEG)
    out = _finish_by_extraction(
        k2, (b2d.reshape(S, _SEG), c2d.reshape(S, _SEG)),
        out.reshape(S, _SEG), fail.reshape(S, _SEG),
        _pg_gamma_draw_small, K_cap=1024, R_cap=12)
    out = out.reshape(-1)[:total]
    return jnp.where(b.ravel() > 0, out, 0.0).reshape(shape)


# ---------------------------------------------------------------------------
# CRT (Chinese-restaurant-table) count kernel — the NB dispersion aux
# ---------------------------------------------------------------------------


def _crt_kernel(seed_ref, y_ref, r_ref, out_ref, *, max_y):
    """l = sum_{i=0}^{y-1} Bernoulli(r / (r + i)) in VMEM — the XLA path
    (ops/linalg.py crt_sample) pays max_y separate 80 MB rng/compare
    passes; here the whole table loop runs on registers (f32 masks — no
    i1 vectors on Mosaic)."""
    pid = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0] + pid * 1000003, seed_ref[1] + pid)
    shape = y_ref.shape
    y = y_ref[:]
    r = r_ref[:]
    zero = jnp.zeros(shape, jnp.float32)

    def body(i, l):
        fi = i.astype(jnp.float32)
        u = _uniform(shape)
        p = r / (r + fi)
        take = jnp.where(u < p, 1.0, 0.0) * jnp.where(fi < y, 1.0, 0.0)
        return l + take

    out_ref[:] = lax.fori_loop(0, max_y, body, zero)


@partial(jax.jit, static_argnames=("max_y",))
def crt_sample_pallas(key, y, r, max_y: int):
    """Fused CRT table counts; y (any shape), r broadcastable to y."""
    y = jnp.asarray(y, jnp.float32)
    r = jnp.broadcast_to(jnp.asarray(r, jnp.float32), y.shape)
    shape = y.shape
    total = y.size
    per_blk = _BLK * _LANES
    n_blk = -(-total // per_blk)
    padn = n_blk * per_blk - total
    y2 = jnp.pad(y.ravel(), (0, padn)).reshape(n_blk * _BLK, _LANES)
    r2 = jnp.pad(r.ravel(), (0, padn),
                 constant_values=1.0).reshape(n_blk * _BLK, _LANES)
    seed = jax.random.key_data(key).astype(jnp.uint32)[:2].astype(jnp.int32)
    spec = pl.BlockSpec((_BLK, _LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_crt_kernel, max_y=max_y),
        grid=(n_blk,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((n_blk * _BLK, _LANES), jnp.float32),
    )(seed, y2, r2)
    return out.reshape(-1)[:total].reshape(shape).astype(jnp.int32)
