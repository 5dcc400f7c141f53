"""Double-word fp32 ("df64") arithmetic + an MXU GEMM with fp64-grade
accuracy — the on-chip route to the reference's fp64 contract.

The reference's compute path is fp64 end-to-end (``v6_test.c:57`` dpotrf;
``lapacke_dpotrf.c:54``) and its residual gate is ≤1e-10. This TPU has no
fast fp64 (and fp64 silently degrades on this chip's path — CLAUDE.md), so
the rebuild's accelerator tiers stop at fp32-grade residuals. This module
closes that gap with software double-word arithmetic:

- **storage**: every matrix is a pair ``(hi, lo)`` of fp32 arrays with
  ``|lo| ≤ ulp(hi)/2`` — ~49 mantissa bits (the classic double-float /
  "df64" representation; Dekker 1971);
- **VPU scalar ops**: error-free transformations (two_sum, two_prod via
  Dekker splitting — no FMA dependence) give add/mul/div/sqrt correct to
  ~2⁻⁴⁸ relative;
- **MXU GEMM** (:func:`df64_matmul_nt`): an Ozaki-style splitting — each
  df64 operand row is sliced into S bf16 slices of w mantissa bits on a
  fixed per-row power-of-2 grid, so every slice product is EXACT in fp32
  and every within-chunk MXU accumulation of ≤ 2^(26−2w) products is
  EXACT (all partials are integer multiples of the pair's grid below the
  24-bit ceiling). Chunk partials of the high-significance slice pairs
  are combined with compensated (two_sum) VPU adds into a df64
  accumulator; low-significance pairs (s+t > ``precise_deg``) tolerate
  plain fp32 accumulation and run as single full-K dots. The dropped
  pairs (s+t ≥ S) and the slice-truncation tail bound the method error
  at ~K·2^(−S·w) relative to the row-scale product — ≲1e-11 at
  S=6, w=8, K=4096, and tunable (S=7 buys 8 more bits at +36% passes).

Cost: S(S+1)/2 = 21 one-pass bf16 MXU passes at S=6 (the same MXU mode as
the ``default`` tier, so the speed-of-light is ~182/21 ≈ 8.7 TF/s on v5e)
plus ~13% VPU compensation — vs the reference's 204.8 GF/s fp64 ceiling
on its hybrid CPU+GPU node.

All functions are jit-safe, run on CPU (tests validate against true
fp64) and TPU. Caveat: per-row scales keep slices in the normal bf16
range for data within ~2^±60; subnormal-range inputs lose the guarantee
(TPU flushes subnormals).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

_F32 = jnp.float32
_DEFAULT = lax.Precision.DEFAULT


# ---------------------------------------------------------------------------
# Error-free transformations (elementwise, VPU)
# ---------------------------------------------------------------------------


def two_sum(a, b):
    """Knuth two-sum: s + e == a + b exactly, s = fl(a + b)."""
    s = a + b
    v = s - a  # the part of b that made it into s
    e = (a - (s - v)) + (b - v)
    return s, e


def quick_two_sum(a, b):
    """Fast two-sum valid when |a| >= |b| (renormalization step)."""
    s = a + b
    e = b - (s - a)
    return s, e


def split32(a):
    """Dekker split of fp32 into two 12-bit halves (no FMA needed)."""
    c = a * _F32(4097.0)  # 2**12 + 1
    hi = c - (c - a)
    return hi, a - hi


def two_prod(a, b):
    """p + e == a * b exactly, p = fl(a * b) (Dekker, fp32)."""
    p = a * b
    ah, al = split32(a)
    bh, bl = split32(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


# ---------------------------------------------------------------------------
# df64 elementwise arithmetic on (hi, lo) pairs
# ---------------------------------------------------------------------------


def df_renorm(h, l):
    return quick_two_sum(h, l)


def df_add(xh, xl, yh, yl):
    """Accurate (IEEE-style) double-word add — stays relatively accurate
    under cancellation, unlike the 3-op "sloppy" variant."""
    sh, se = two_sum(xh, yh)
    th, te = two_sum(xl, yl)
    se = se + th
    sh, se = quick_two_sum(sh, se)
    se = se + te
    return quick_two_sum(sh, se)


def df_neg(xh, xl):
    return -xh, -xl


def df_sub(xh, xl, yh, yl):
    return df_add(xh, xl, -yh, -yl)


def df_add_f32(xh, xl, y):
    s, e = two_sum(xh, y)
    e = e + xl
    return quick_two_sum(s, e)


def df_mul(xh, xl, yh, yl):
    p, e = two_prod(xh, yh)
    e = e + (xh * yl + xl * yh)
    return quick_two_sum(p, e)


def df_div(xh, xl, yh, yl):
    q1 = xh / yh
    # r = x - q1*y, in df64
    ph, pl = df_mul(q1, jnp.zeros_like(q1), yh, yl)
    rh, rl = df_sub(xh, xl, ph, pl)
    q2 = rh / yh
    ph, pl = df_mul(q2, jnp.zeros_like(q2), yh, yl)
    rh, rl = df_sub(rh, rl, ph, pl)
    q3 = rh / yh
    s, e = quick_two_sum(q1, q2)
    return quick_two_sum(s, e + q3)


def df_sqrt(xh, xl):
    """One df64 Newton step from the fp32 sqrt (doubles the precision)."""
    s = jnp.sqrt(xh)
    safe = jnp.where(s > 0, s, _F32(1.0))
    ph, pl = two_prod(safe, safe)
    rh, rl = df_sub(xh, xl, ph, pl)
    corr = rh / (2.0 * safe)
    h, l = quick_two_sum(safe, corr)
    zero = xh <= 0
    return jnp.where(zero, 0.0, h), jnp.where(zero, 0.0, l)


def to_df64(a64):
    """Split a host float64 array into the (hi, lo) fp32 pair (host-side
    numpy — exact regardless of the backend's x64 support)."""
    import numpy as np

    a = np.asarray(a64, np.float64)
    hi = a.astype(np.float32)
    lo = (a - hi.astype(np.float64)).astype(np.float32)
    return jnp.asarray(hi), jnp.asarray(lo)


def from_df64(h, l, dtype=jnp.float64):
    """Recombine to wide dtype (exact when dtype is fp64 on CPU/x64)."""
    return h.astype(dtype) + l.astype(dtype)


# ---------------------------------------------------------------------------
# Ozaki-style slicing: df64 rows -> S exact bf16 slices on a 2^k grid
# ---------------------------------------------------------------------------


def _pow2_ceil(x):
    """Smallest power of two >= x (x > 0), elementwise via exponent bits —
    TPU-safe (no frexp)."""
    bits = lax.bitcast_convert_type(x.astype(_F32), jnp.int32)
    exp = (bits >> 23) & 0xFF
    frac = bits & 0x7FFFFF
    # x = f * 2^(exp-127), 1 <= f < 2; ceil to 2^(exp-127+1) unless f == 1
    exp = jnp.where(frac == 0, exp, exp + 1)
    return lax.bitcast_convert_type(exp << 23, _F32)


def slice_rows(ah, al, *, s: int = 6, w: int = 8):
    """Slice a df64 matrix row-wise into ``s`` bf16 matrices of ``w``-bit
    mantissas on a shared per-row power-of-2 grid.

    Returns (slices, mu): ``slices`` is a list of s bf16 arrays whose fp32
    values are EXACT (each is a multiple of its grid with ≤ w significant
    bits); ``mu`` the (rows, 1) fp32 per-row scale. Σ slices reproduces
    hi+lo to ≤ mu·2^(−s·w) per element.
    """
    m = ah.shape[0]
    amax = jnp.max(jnp.abs(ah), axis=1, keepdims=True)
    mu = jnp.where(amax > 0, _pow2_ceil(jnp.maximum(amax, 1e-38)), _F32(1.0))
    rh, rl = ah, al
    out = []
    for t in range(s):
        # grid g_t = mu * 2^(-(t+1)w + 1); sigma = 1.5 * 2^23 * g_t forces
        # round-to-nearest onto that grid for |r| < sigma/2
        g = mu * _F32(2.0 ** (-(t + 1) * w + 1))
        sigma = _F32(1.5 * 2.0**23) * g
        st = (rh + sigma) - sigma
        out.append(st.astype(jnp.bfloat16))
        # exact df64 subtraction of the captured slice
        rh, rl = df_add(rh, rl, -st, jnp.zeros_like(st))
    return out, mu


def max_exact_chunk(w: int = 8) -> int:
    """Largest contraction-chunk length whose fp32 accumulation of slice
    products is EXACT: products are multiples of g_s·g_t with magnitude
    ≤ 2^(2w−2)·g_s·g_t, so c·2^(2w−2) ≤ 2^24 → c = 2^(26−2w)."""
    return 2 ** (26 - 2 * w)


def _dot_nt_bf16(a, b):
    """(m,k) bf16 · (n,k) bf16 → (m,n) fp32, single MXU pass (explicitly
    DEFAULT precision — the library-wide HIGH policy must not promote
    these; the splitting itself provides the accuracy)."""
    return lax.dot_general(
        a, b, (((1,), (1,)), ((), ())),
        preferred_element_type=_F32, precision=_DEFAULT,
    )


def df64_matmul_nt(
    ah, al, bh, bl, *,
    s: int = 6, w: int = 8, precise_deg: int = 3,
    chunk: int | None = None,
    slices_a=None, slices_b=None,
):
    """C = A · Bᵀ with ~2⁻⁴⁴-grade accuracy on the MXU.

    ``a``: (m, k) df64 pair, ``b``: (n, k) df64 pair → (Ch, Cl) (m, n).

    Slice pairs (i, j) with i+j ≥ s are dropped (< 2^(−s·w) relative);
    pairs with i+j ≤ ``precise_deg`` accumulate chunk-exactly with
    compensated adds; the rest run as plain full-K single dots (their
    fp32 accumulation error is ≤ √k·2⁻²⁴ relative to a 2^(−(i+j)w)-scaled
    term — negligible once (i+j)·w ≳ 20). ``slices_a/_b`` accept
    pre-sliced operands (a POTRF panel is sliced once and used on both
    sides of its trailing update).
    """
    if chunk is None:
        chunk = max_exact_chunk(w)
    sa, _ = slice_rows(ah, al, s=s, w=w) if slices_a is None else (
        slices_a, None)
    sb, _ = slice_rows(bh, bl, s=s, w=w) if slices_b is None else (
        slices_b, None)
    k = (ah if ah is not None else sa[0]).shape[-1]
    m = sa[0].shape[0]
    n = sb[0].shape[0]
    ch = jnp.zeros((m, n), _F32)
    cl = jnp.zeros((m, n), _F32)

    # precise pairs: chunked exact partials, compensated accumulation
    nchunks = -(-k // chunk)
    for c0 in range(nchunks):
        lo, hi = c0 * chunk, min((c0 + 1) * chunk, k)
        for i in range(s):
            for j in range(s - i):
                if i + j > precise_deg:
                    continue
                p = _dot_nt_bf16(sa[i][:, lo:hi], sb[j][:, lo:hi])
                ch, e = two_sum(ch, p)
                cl = cl + e

    # low-significance pairs: one full-K dot each, error absorbed in cl
    for i in range(s):
        for j in range(s - i):
            if i + j <= precise_deg:
                continue
            cl = cl + _dot_nt_bf16(sa[i], sb[j])

    return quick_two_sum(ch, cl)


def df64_matmul_cost(k: int, *, s: int = 6, w: int = 8) -> dict:
    """MXU pass count / flop multiplier of the scheme (for roofline use)."""
    passes = s * (s + 1) // 2
    return {
        "passes": passes,
        "mxu_flops_multiplier": passes,
        "chunk": max_exact_chunk(w),
        "relative_error_bound": k * 2.0 ** (-s * w),
    }
