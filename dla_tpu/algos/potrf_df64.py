"""Blocked Cholesky in emulated fp64 (df64) — the on-chip ≤1e-10 factor.

The reference's factorization is fp64 (``v6_test.c:57`` CHAMELEON_dpotrf,
204.8 GF/s repo-best) and its gate is ≤1e-10; this chip has no fast fp64.
This module factors a double-word fp32 matrix (``ops/df64``: ~49 mantissa
bits) entirely on the accelerator:

- **trailing update** (the ~N³/3 flops): :func:`dla_tpu.ops.df64.df64_matmul_nt`
  — S(S+1)/2 = 21 one-pass bf16 MXU passes with exact-product slicing and
  compensated accumulation; the panel is sliced ONCE and used on both
  sides of its own P·Pᵀ;
- **diagonal factor**: fp32 ``lax.linalg.cholesky`` + Ogita/Oishi-style
  refinement — E = A_kk − L·Lᵀ evaluated in df64, correction
  dL = L·Φ(L⁻¹ E L⁻ᵀ) solved in fp32 (E is already O(eps32)·|A|, so an
  fp32 solve leaves O(eps32²) ≈ 1e-14 error), Φ = strict-lower + half
  diagonal. Two iterations reach the df64 floor;
- **panel solve**: fp32 triangular solve + the same df64-residual
  refinement (each step: one df64 GEMM X·L_kkᵀ + one fp32 TRSM).

Everything is jit-compatible (trace-time unrolled panel loop, static
shapes); runs on CPU (tests gate vs scipy fp64 at 1e-13) and TPU (the
``f64x`` bench tier — the probe artifact is benchmarks/df64_probe.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from dla_tpu.ops.df64 import (
    df_add,
    df_sub,
    df64_matmul_nt,
    slice_rows,
    two_sum,
)
from dla_tpu.ops.lapack_like import plgsy_tile

_F32 = jnp.float32

# NOTE (r5): lax.linalg.cholesky / triangular_solve measured FP32-GRADE
# on this chip at every size and flavor (1.5e-7 / 2.4e-7 — the on-chip
# accuracy matrix, results_r5/df64_linalg_matrix.jsonl), so the df64
# refinement's eps_t is ~2e-7 and refine=2 reaches the df64 floor. Two
# r5 probe "failures" that suggested otherwise were METER artifacts
# (fp32 scipy reference from un-x64 plgsy-on-TPU; a ||B||-instead-of-
# ||A|| denominator) — see docs/STATUS_r5.md. The thin wrappers below
# also pin float32 via the global-default context; numerically a no-op
# here, kept as cheap insurance against backend default changes (the
# context covers op creation at trace/lowering of THESE helpers).


def _chol32(a):
    with jax.default_matmul_precision("float32"):
        return lax.linalg.cholesky(a, symmetrize_input=False)


def _trsolve32(a, b, **kw):
    with jax.default_matmul_precision("float32"):
        return lax.linalg.triangular_solve(a, b, **kw)


def _phi(m):
    """Φ(M) = strict lower triangle + half the diagonal (the lower-
    triangular solution of Φ + Φᵀ = M for symmetric M)."""
    return jnp.tril(m, -1) + 0.5 * jnp.diagflat(jnp.diagonal(m))


def _factor_diag_df64(akk_h, akk_l, *, refine: int, gemm_kw) -> tuple:
    """df64 Cholesky of one nb×nb block: fp32 factor + `refine` steps of
    df64-residual correction (each O(eps32) → O(eps32²) → df64 floor).

    The block is re-symmetrized from its LOWER triangle first: trailing
    backends that update lower tiles only (the Pallas pair-grid kernel
    with tb < nb) leave the block's upper tiles stale, and the refinement
    residual E = A − L·Lᵀ reads the full block — a stale upper would
    contaminate the correction through L⁻¹·E·L⁻ᵀ."""
    low_h = jnp.tril(akk_h)
    low_l = jnp.tril(akk_l)
    d_h = jnp.diagflat(jnp.diagonal(akk_h))
    d_l = jnp.diagflat(jnp.diagonal(akk_l))
    akk_h, akk_l = df_add(low_h, low_l, low_h.T - d_h, low_l.T - d_l)
    l0 = jnp.tril(_chol32(akk_h))
    lh, ll = l0, jnp.zeros_like(l0)
    for _ in range(refine):
        ph, pl = df64_matmul_nt(lh, ll, lh, ll, **gemm_kw)
        eh, el = df_sub(akk_h, akk_l, ph, pl)
        # M = L⁻¹ E L⁻ᵀ in fp32 (E ~ eps·|A|: fp32 relative error on the
        # correction is second-order)
        m1 = _trsolve32(lh, eh, left_side=True, lower=True)
        m = _trsolve32(lh, m1, left_side=False, lower=True,
                       transpose_a=True)
        dl = jnp.matmul(lh, _phi(m), precision=lax.Precision.HIGHEST)
        lh, ll = df_add(lh, ll, dl, jnp.zeros_like(dl))
        lh = jnp.tril(lh)
        ll = jnp.tril(ll)
    return lh, ll


def _panel_solve_df64(lkk_h, lkk_l, bh, bl, *, refine: int, gemm_kw) -> tuple:
    """Solve X·L_kkᵀ = B in df64: fp32 TRSM + df64-residual refinement."""
    def trsm(r):
        return _trsolve32(lkk_h, r, left_side=False, lower=True,
                          transpose_a=True)

    xh = trsm(bh)
    xl = jnp.zeros_like(xh)
    sl_l = slice_rows(lkk_h, lkk_l, s=gemm_kw.get("s", 6),
                      w=gemm_kw.get("w", 8))[0]
    for _ in range(refine):
        ph, pl = df64_matmul_nt(
            xh, xl, lkk_h, lkk_l, slices_b=sl_l, **gemm_kw)
        rh, rl = df_sub(bh, bl, ph, pl)
        dx = trsm(rh)
        xh, xl = df_add(xh, xl, dx, jnp.zeros_like(dx))
    return xh, xl


@functools.partial(
    jax.jit,
    static_argnames=("nb", "refine", "s", "w", "precise_deg",
                     "trailing_strips", "trailing", "tb"),
)
def potrf_df64(
    ah: jax.Array,
    al: jax.Array,
    *,
    nb: int = 1024,
    refine: int = 2,
    s: int = 7,
    w: int = 8,
    precise_deg: int = 3,
    trailing_strips: int = 4,
    trailing: str = "xla",
    tb: int = 512,
) -> tuple[jax.Array, jax.Array]:
    """Right-looking blocked df64 POTRF of the (hi, lo) pair → (Lh, Ll),
    lower triangle (upper zeroed). ``nb`` must divide N. The accuracy
    knobs (s slices of w bits, `precise_deg` compensated cross-degree,
    `refine` panel corrections) default to the gate-safe configuration:
    the trailing truncation scales ~n·2^(−s·w), so s=6 sits right AT the
    1e-10 gate by N=4096 (measured 1.03e-10 on chip) while s=7 passes
    with 100× margin at only ~10% end-to-end cost (measured 1.56 vs
    1.41 TF/s at N=8192 — benchmarks/results_r4/df64_probe.jsonl).
    ``trailing_strips`` splits the trailing update into that many
    lower-trapezoid column strips (triangle-aware: ~(strips−1)/
    (2·strips) of the square update's MXU passes saved — 37.5% at 4 —
    at +strips× kernel launches; 1 = plain square update).

    ``trailing="pallas"`` replaces the XLA strip loop with the fused
    in-VMEM pass-loop kernel (``kernels/df64_tiles.trailing_update_df64``,
    ``tb``-tile lower-triangle pair grid) — one C-pair load/store per
    panel step instead of one per MXU pass, and exactly triangle-only."""
    n = ah.shape[0]
    if ah.shape != (n, n) or al.shape != (n, n):
        raise ValueError(f"need square (hi, lo) pair, got {ah.shape}")
    if n % nb:
        raise ValueError(f"n={n} must be a multiple of nb={nb}")
    if trailing == "pallas" and (n % tb or nb % tb):
        raise ValueError(f"trailing='pallas' needs tb | nb | n (tb={tb})")
    gemm_kw = dict(s=s, w=w, precise_deg=precise_deg)
    ah = ah.astype(_F32)
    al = al.astype(_F32)
    for k in range(0, n, nb):
        k1 = k + nb
        lkk_h, lkk_l = _factor_diag_df64(
            ah[k:k1, k:k1], al[k:k1, k:k1], refine=refine, gemm_kw=gemm_kw)
        ah = ah.at[k:k1, k:k1].set(lkk_h)
        al = al.at[k:k1, k:k1].set(lkk_l)
        if k1 == n:
            break
        xh, xl = _panel_solve_df64(
            lkk_h, lkk_l, ah[k1:, k:k1], al[k1:, k:k1],
            refine=refine, gemm_kw=gemm_kw)
        ah = ah.at[k1:, k:k1].set(xh)
        al = al.at[k1:, k:k1].set(xl)
        # trailing: C ← C − X·Xᵀ. Slices are per-ROW scaled, so row
        # sub-ranges of the panel's slice set are themselves valid slice
        # sets — the panel is sliced ONCE and reused.
        h = n - k1
        sx = slice_rows(xh, xl, s=s, w=w)[0]
        if trailing == "pallas":
            from dla_tpu.kernels.df64_tiles import trailing_update_df64

            ah, al = trailing_update_df64(
                ah, al, sx, origin=k1 // tb, tb=tb, w=w,
                precise_deg=precise_deg)
            continue
        nstr = max(1, min(trailing_strips, h // nb))
        bounds = [
            (i * (h // nb) // nstr) * nb for i in range(nstr)
        ] + [h]
        for i in range(nstr):
            j0, j1 = bounds[i], bounds[i + 1]
            th, tl = df64_matmul_nt(
                xh[j0:], xl[j0:], xh[j0:j1], xl[j0:j1],
                slices_a=[sl[j0:] for sl in sx],
                slices_b=[sl[j0:j1] for sl in sx],
                **gemm_kw)
            ch, cl = df_sub(
                ah[k1 + j0:, k1 + j0: k1 + j1],
                al[k1 + j0:, k1 + j0: k1 + j1], th, tl)
            ah = ah.at[k1 + j0:, k1 + j0: k1 + j1].set(ch)
            al = al.at[k1 + j0:, k1 + j0: k1 + j1].set(cl)
    return jnp.tril(ah), jnp.tril(al)


def potrf_packed_df64(
    aph: jax.Array,
    apl: jax.Array,
    n: int,
    nb: int,
    *,
    ktb: int = 512,
    refine: int = 2,
    s: int = 7,
    w: int = 8,
    precise_deg: int = 3,
    k0: int = 0,
    k1: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Right-looking df64 POTRF **in packed space**: the (hi, lo) pair is
    two column-slab packed lower triangles (``dla_tpu.algos.packed``
    layout, slab width ``nb``), so the resident factor state is
    n·(n+nb) bytes ≈ 4·n² instead of the dense pair's 8·n² — extending
    the emulated-fp64 in-core frontier ~√2× (N=32768 dense → N≈49152
    packed on a 15.75 GiB chip). Per step: df64 diagonal factor + df64
    panel solve (reused from :func:`potrf_df64` — the slab's diagonal
    block is re-symmetrized there, since the packed trailing kernel
    updates lower-triangle tiles only), then ONE fused Pallas trailing
    wave over the packed pair (``kernels/df64_tiles.
    trailing_update_packed_df64``, kernel tile ``ktb``). Returns the
    packed (Lh, Ll) pair; diagonal slabs carry stale upper-tile garbage
    exactly like the fp32 ``potrf_packed`` — ``unpack_tri`` masks it.

    Capability beyond the reference: its fp64 path is dense full-square
    storage (``v6_test.c:41-47``); packed×df64 combines the two rebuild
    extensions (triangle-only storage, on-chip 1e-10 factorization).

    ``k0``/``k1`` (static) restrict execution to slab steps
    ``[k0, k1)`` — the building block :func:`potrf_packed_df64_split`
    uses to break the factorization into several smaller jitted
    programs, clearing the remote compile service's program×footprint
    wall (r5 bracket: 45 unrolled steps at an 8.09 GiB pair compile OK,
    47 at 8.81 GiB crash the helper; the N=49152 monolith is past it)."""
    from dla_tpu.algos.packed import _check, _set_col, col_slab
    from dla_tpu.kernels.df64_tiles import trailing_update_packed_df64

    _check(n, nb)
    if nb % ktb:
        raise ValueError(f"need ktb | nb (nb={nb}, ktb={ktb})")
    gemm_kw = dict(s=s, w=w, precise_deg=precise_deg)
    nt = n // nb
    if k1 is None:
        k1 = nt
    if not 0 <= k0 <= k1 <= nt:
        raise ValueError(f"need 0 <= k0 <= k1 <= nt, got [{k0}, {k1})")
    aph = aph.astype(_F32)
    apl = apl.astype(_F32)
    for k in range(k0, k1):
        ch = col_slab(aph, k, n, nb)
        cl = col_slab(apl, k, n, nb)
        lkk_h, lkk_l = _factor_diag_df64(
            ch[:nb], cl[:nb], refine=refine, gemm_kw=gemm_kw)
        if k + 1 < nt:
            xh, xl = _panel_solve_df64(
                lkk_h, lkk_l, ch[nb:], cl[nb:],
                refine=refine, gemm_kw=gemm_kw)
            nc_h = jnp.concatenate([lkk_h, xh], axis=0)
            nc_l = jnp.concatenate([lkk_l, xl], axis=0)
        else:
            nc_h, nc_l = lkk_h, lkk_l
        aph = _set_col(aph, k, nc_h, n, nb)
        apl = _set_col(apl, k, nc_l, n, nb)
        if k + 1 < nt:
            sx = slice_rows(xh, xl, s=s, w=w)[0]
            aph, apl = trailing_update_packed_df64(
                aph, apl, sx, n=n, nb=nb, k=k, tb=ktb, w=w,
                precise_deg=precise_deg)
    return aph, apl


_PACKED_FAC_JIT = None


def _packed_fac_jit():
    """Shared jitted potrf_packed_df64 for the split path — one wrapper
    per process so repeated split runs reuse cached executables instead
    of paying this service's 45-90 s remote program load per segment
    per call (CLAUDE.md: memoize jit objects)."""
    global _PACKED_FAC_JIT
    if _PACKED_FAC_JIT is None:
        _PACKED_FAC_JIT = jax.jit(
            potrf_packed_df64,
            static_argnames=("n", "nb", "ktb", "refine", "s", "w",
                             "precise_deg", "k0", "k1"),
            donate_argnums=(0, 1),
        )
    return _PACKED_FAC_JIT


def potrf_packed_df64_split(
    aph: jax.Array,
    apl: jax.Array,
    n: int,
    nb: int,
    *,
    split: int = 2,
    ktb: int = 512,
    refine: int = 2,
    s: int = 7,
    w: int = 8,
    precise_deg: int = 3,
) -> tuple[jax.Array, jax.Array]:
    """:func:`potrf_packed_df64` executed as ``split`` host-sequenced
    jitted segment programs of ~nt/split slab steps each, the pair
    donated through the chain — numerically identical to the monolith
    (same step sequence, only the jit boundaries move), but each
    program is a fraction of the monolith's size. This is the route
    past the remote compile service's program×footprint wall
    (ROADMAP r5: N=46080/nt=45 OK, N=48128/nt=47 HTTP-500, and a
    trivial donated program over the full N=49152 pair compiles fine —
    so shrinking the *program*, not the footprint, is what unlocks
    N≥48128). Costs ``split`` compiles + remote program loads
    (~45-90 s each on this tunneled service) instead of one.

    Reference scope: N-scaling is the reference sweep's whole axis
    (``benchmark.c:76-80``); its fp64 path stops where dense
    ``double[N*N]`` storage stops, with no analogue of this wall.

    ``split=0`` auto-sizes: the fewest segments keeping every program
    at <= 40 unrolled steps (safely inside the measured 45-OK/47-crash
    bracket), i.e. 1 segment through N=40·nb and growing as N does."""
    if split < 0:
        raise ValueError(f"split must be >= 0, got {split}")
    nt = n // nb
    if split == 0:
        split = -(-nt // 40)
    split = min(split, nt)
    fac = _packed_fac_jit()
    bounds = [round(i * nt / split) for i in range(split + 1)]
    for i in range(split):
        aph, apl = fac(
            aph, apl, n, nb, ktb=ktb, refine=refine, s=s, w=w,
            precise_deg=precise_deg, k0=bounds[i], k1=bounds[i + 1])
    return aph, apl


def trmm_packed_df64(
    lph: jax.Array,
    lpl: jax.Array,
    xh: jax.Array,
    xl: jax.Array,
    n: int,
    nb: int,
    *,
    trans: bool = False,
    s: int = 7,
    w: int = 8,
    precise_deg: int = 3,
) -> tuple[jax.Array, jax.Array]:
    """Y = L·X (or Lᵀ·X) in df64 from the **packed** factor pair — one
    df64 GEMM per column slab, accumulated with compensated adds (the
    packed df64 ``dtrmm``; the residual engine of the packed df64 solve).
    X is an (n, nrhs) df64 pair."""
    from dla_tpu.algos.packed import _check, col_slab

    _check(n, nb)
    gemm_kw = dict(s=s, w=w, precise_deg=precise_deg)
    nt = n // nb
    yh = jnp.zeros_like(xh)
    yl = jnp.zeros_like(xl)
    for j in range(nt):
        ch = col_slab(lph, j, n, nb)
        cl = col_slab(lpl, j, n, nb)
        if not trans:
            # y[j·nb:] += colj · x_j
            ph, pl = df64_matmul_nt(
                ch, cl, xh[j * nb:(j + 1) * nb].T,
                xl[j * nb:(j + 1) * nb].T, **gemm_kw)
            ah, al_ = df_add(yh[j * nb:], yl[j * nb:], ph, pl)
            yh = yh.at[j * nb:].set(ah)
            yl = yl.at[j * nb:].set(al_)
        else:
            # y_j += coljᵀ · x[j·nb:]
            ph, pl = df64_matmul_nt(
                ch.T, cl.T, xh[j * nb:].T, xl[j * nb:].T, **gemm_kw)
            ah, al_ = df_add(
                yh[j * nb:(j + 1) * nb], yl[j * nb:(j + 1) * nb], ph, pl)
            yh = yh.at[j * nb:(j + 1) * nb].set(ah)
            yl = yl.at[j * nb:(j + 1) * nb].set(al_)
    return yh, yl


def potrs_packed_df64(
    lph: jax.Array,
    lpl: jax.Array,
    bh: jax.Array,
    bl: jax.Array,
    n: int,
    nb: int,
    *,
    refine: int = 2,
    s: int = 7,
    w: int = 8,
    precise_deg: int = 3,
    engine: str = "trmm",
) -> tuple[jax.Array, jax.Array]:
    """Solve L·Lᵀ·X = B in df64 **from the packed factor pair** — the
    fp64-contract solve at packed-frontier sizes where the dense pair
    cannot be unpacked next to B. fp32 packed substitution
    (:func:`dla_tpu.algos.packed.potrs_packed` on the hi plane) +
    ``refine`` steps of df64-residual correction, each one packed df64
    L·(Lᵀ·x) reconstruction and one fp32 substitution — the same
    O(eps32)→O(eps32²) scheme as the dense :func:`potrs_df64`. B is an
    (n, nrhs) df64 pair.

    ``engine`` selects the reconstruction: ``"trmm"`` = per-slab df64
    GEMMs (:func:`trmm_packed_df64` — best MXU shapes, but trace-time
    unrolled: ~28·nt dots per trmm, a PROGRAM-SIZE hazard under this
    environment's remote compile service at nt ≳ 24 when the whole solve
    is jitted as one program); ``"matvec"`` = the descriptor-table fori
    loop (:func:`_packed_matvec_df64` — ONE compact loop program per
    direction, the r5 record-certification engine)."""
    from dla_tpu.algos.packed import potrs_packed

    gemm_kw = dict(s=s, w=w, precise_deg=precise_deg)
    if engine == "matvec":
        desc = jnp.asarray(_packed_tile_desc(n, nb))
        mv_kw = dict(nb=nb, **gemm_kw)

        def recon(xh_, xl_):
            th_, tl_ = _packed_matvec_df64(
                lph, lpl, desc, xh_, xl_, trans=True, **mv_kw)
            return _packed_matvec_df64(
                lph, lpl, desc, th_, tl_, trans=False, **mv_kw)
    else:
        def recon(xh_, xl_):
            th_, tl_ = trmm_packed_df64(
                lph, lpl, xh_, xl_, n, nb, trans=True, **gemm_kw)
            return trmm_packed_df64(
                lph, lpl, th_, tl_, n, nb, trans=False, **gemm_kw)

    xh = potrs_packed(lph, bh, n, nb)
    xl = jnp.zeros_like(xh)
    for _ in range(refine):
        ph, pl = recon(xh, xl)
        rh, rl = df_sub(bh, bl, ph, pl)
        dx = potrs_packed(lph, rh, n, nb)
        xh, xl = df_add(xh, xl, dx, jnp.zeros_like(dx))
    return xh, xl


def _df64_rowsum_max(h, l):
    """max_i Σ_j (|h| + |l|)[i, j] with a compensated column fold — the
    df64-grade ∞-norm bound of a (hi, lo) matrix."""
    m = h.shape[0]

    def body(j, carry):
        acc_h, acc_l = carry
        col = jnp.abs(h[:, j]) + jnp.abs(l[:, j])
        sh, e = two_sum(acc_h, col)
        return sh, acc_l + e

    acc_h, acc_l = lax.fori_loop(
        0, h.shape[1], body,
        (jnp.zeros((m,), _F32), jnp.zeros((m,), _F32)))
    return jnp.max(acc_h + acc_l)


@functools.partial(
    jax.jit, static_argnames=("s", "w", "precise_deg", "refine"))
def potrs_df64(
    lh: jax.Array,
    ll: jax.Array,
    bh: jax.Array,
    bl: jax.Array,
    *,
    s: int = 7,
    w: int = 8,
    precise_deg: int = 3,
    refine: int = 2,
) -> tuple[jax.Array, jax.Array]:
    """Solve L·Lᵀ·X = B in df64 from a :func:`potrf_df64` factor — the
    fp64-contract SOLVE on the accelerator (the reference's posv gate,
    ``v6_test.c:87``). Each substitution is an fp32 triangular solve +
    ``refine`` steps of df64-residual correction (one df64 GEMM + one
    fp32 TRSM per step — the same scheme as the factor's panel solve).
    B is an (n, nrhs) df64 pair; returns the (Xh, Xl) pair."""
    gemm_kw = dict(s=s, w=w, precise_deg=precise_deg)

    def tr(r, transpose):
        return _trsolve32(
            lh, r, left_side=True, lower=True, transpose_a=transpose)

    def refine_solve(rh_in, rl_in, transpose, op_h, op_l):
        """x ≈ OP⁻¹·r with df64-residual refinement; OP = L or Lᵀ given
        as its df64 pair (op_h, op_l) — the GEMM computes OP·x as
        A·Bᵀ with A = OP, B = xᵀ."""
        xh = tr(rh_in, transpose)
        xl = jnp.zeros_like(xh)
        for _ in range(refine):
            ph, pl = df64_matmul_nt(op_h, op_l, xh.T, xl.T, **gemm_kw)
            rh, rl = df_sub(rh_in, rl_in, ph, pl)
            dx = tr(rh, transpose)
            xh, xl = df_add(xh, xl, dx, jnp.zeros_like(dx))
        return xh, xl

    yh, yl = refine_solve(bh, bl, False, lh, ll)
    return refine_solve(yh, yl, True, lh.T, ll.T)


@functools.partial(
    jax.jit, static_argnames=("s", "w", "precise_deg", "lo_is_zero"))
def _matvec_strip_df64(mh_s, ml_s, xth, xtl, *, s, w, precise_deg,
                       lo_is_zero=False):
    """(strip, k) df64 · (k,) df64 probes — one strip of a df64 matvec
    (slices computed per strip: O(strip·k) transient memory).
    ``lo_is_zero`` synthesizes the lo plane inside the jit (strip-sized)
    so an exactly-fp32 matrix never materializes an (n, n) zeros array."""
    if lo_is_zero:
        ml_s = jnp.zeros_like(mh_s)
    return df64_matmul_nt(mh_s, ml_s, xth, xtl,
                          s=s, w=w, precise_deg=precise_deg)


def _matvec_df64(mh, ml, xth, xtl, *, s, w, precise_deg, row_chunk):
    """Full df64 matvec M·X (X given transposed: (nrhs, k) pair) by
    jitted row strips — keeps slice memory O(row_chunk·k), which is what
    lets frontier-size factors be validated on a 16 GiB chip.
    ``ml=None`` means the lo plane is exactly zero."""
    m = mh.shape[0]
    outs_h, outs_l = [], []
    for r0 in range(0, m, row_chunk):
        r1 = min(m, r0 + row_chunk)
        h, l = _matvec_strip_df64(
            mh[r0:r1], mh[r0:r1] if ml is None else ml[r0:r1], xth, xtl,
            s=s, w=w, precise_deg=precise_deg, lo_is_zero=ml is None)
        outs_h.append(h)
        outs_l.append(l)
    return jnp.concatenate(outs_h), jnp.concatenate(outs_l)


@functools.partial(
    jax.jit, static_argnames=("s", "w", "precise_deg"),
    donate_argnums=(4, 5))
def _matvec_t_strip_df64(mh_s, ml_s, xth_c, xtl_c, acc_h, acc_l, *,
                         s, w, precise_deg):
    """One row-strip contribution of a TRANSPOSED df64 matvec:
    acc += (M_strip)ᵀ · x_strip, the strip transposed INSIDE the program
    (XLA folds it into the dot's dimension numbers). Compensated (df_add)
    accumulation into a donated (k, nrhs) pair."""
    h, l = df64_matmul_nt(mh_s.T, ml_s.T, xth_c, xtl_c,
                          s=s, w=w, precise_deg=precise_deg)
    return df_add(acc_h, acc_l, h, l)


def _matvec_t_df64(mh, ml, xth, xtl, *, s, w, precise_deg, row_chunk):
    """Full df64 matvec Mᵀ·X by jitted row strips of M — the r5 fix for
    the dense-frontier gate OOM: ``_matvec_df64(lh.T, …)`` materialized a
    full (n, n) transposed COPY of each plane on device (8.6 GiB at
    N=32768 next to the resident pair → RESOURCE_EXHAUSTED,
    results_r5/dense_cert_freivalds.log); this streams the transpose
    strip-wise with only strip-sized transients. X given transposed
    ((nrhs, m) pair); returns the (k, nrhs) result pair."""
    m, k = mh.shape
    probes = xth.shape[0]
    acc_h = jnp.zeros((k, probes), _F32)
    acc_l = jnp.zeros((k, probes), _F32)
    for r0 in range(0, m, row_chunk):
        r1 = min(m, r0 + row_chunk)
        acc_h, acc_l = _matvec_t_strip_df64(
            mh[r0:r1], ml[r0:r1], xth[:, r0:r1], xtl[:, r0:r1],
            acc_h, acc_l, s=s, w=w, precise_deg=precise_deg)
    return acc_h, acc_l


def freivalds_potrf_df64(
    lh, ll, ah, al=None, *, probes: int = 2, seed: int = 71,
    s: int = 7, w: int = 8, precise_deg: int = 3, row_chunk: int = 1024,
) -> jax.Array:
    """Streaming Freivalds gate for a df64 factor at frontier sizes:
    ``max_p ||(A − L·Lᵀ)·x_p||_inf / (||A||_inf·||x_p||_inf)`` with every
    matvec in df64 — O(n²) work and O(row_chunk·n) slice memory, where
    the full reconstruction residual (O(n³), full-L slices resident)
    exceeds HBM beyond N≈8192. Same probe/gate contract as the packed
    and out-of-core frontier paths (streaming Freivalds)."""
    import numpy as np

    n = lh.shape[0]
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((probes, n)).astype(np.float32)
    xth = jnp.asarray(x)
    xtl = jnp.zeros_like(xth)
    kw = dict(s=s, w=w, precise_deg=precise_deg, row_chunk=row_chunk)
    # z = Lᵀ·x, streamed over row strips of L — never a materialized Lᵀ
    # copy (r5 fix: the .T pair cost 8.6 GiB at N=32768 and OOMed HBM)
    zt_h, zt_l = _matvec_t_df64(lh, ll, xth, xtl, **kw)
    zh, zl = zt_h, zt_l
    # wv = L·z
    wh, wl = _matvec_df64(lh, ll, zh.T, zl.T, **kw)
    # y = A·x (al=None: A is exactly fp32 — frontier probe inputs)
    yh, yl = _matvec_df64(ah, al, xth, xtl, **kw)
    rh, rl = df_sub(yh, yl, wh, wl)
    num = jnp.max(jnp.abs(rh.astype(_F32) + rl.astype(_F32)))
    if al is None:
        # column-fold (fori) — a fused abs+sum would be one line, but at
        # frontier sizes XLA materialized the |A| plane (4.3 GiB at
        # N=32768) on top of the 12.9 GiB resident set and OOMed
        def _rowsum1(h):
            def body(j, acc):
                return acc + jnp.abs(h[:, j])

            return jnp.max(lax.fori_loop(
                0, h.shape[1], body,
                jnp.zeros((h.shape[0],), _F32)))

        anorm = jax.jit(_rowsum1)(ah)
    else:
        anorm = jax.jit(_df64_rowsum_max)(ah, al)
    xnorm = jnp.max(jnp.abs(xth))
    return num / (anorm * xnorm)


@functools.partial(jax.jit, static_argnames=("s", "w"))
def _jit_slices(lh, ll, *, s, w):
    return tuple(slice_rows(lh, ll, s=s, w=w)[0])


@functools.partial(jax.jit, static_argnames=("s", "w", "precise_deg"))
def _residual_strip(ah_s, al_s, sa, sl, *, s, w, precise_deg):
    ph, pl = df64_matmul_nt(
        None, None, None, None, slices_a=list(sa), slices_b=list(sl),
        s=s, w=w, precise_deg=precise_deg)
    rh, rl = df_sub(ah_s, al_s, ph, pl)
    return _df64_rowsum_max(rh, rl)


def residual_potrf_df64(
    ah, al, lh, ll, *, s: int = 7, w: int = 8, precise_deg: int = 3,
    row_chunk: int = 1024,
) -> jax.Array:
    """||A − L·Lᵀ||_inf / ||A||_inf evaluated in df64 ON DEVICE (fp32-only
    hardware cannot otherwise measure a 1e-13-grade residual; the df64
    GEMM is itself CPU-validated against fp64 in tests). Returns fp32 —
    the magnitude is ~1e-13, far above fp32's smallest normal.

    Structure (shaped by two r4 probe failures): the reconstruction runs
    ONE jitted ``row_chunk``-row strip program, re-invoked per strip from
    the host — a monolithic L·Lᵀ kept tens of (n, n) fp32 pass partials
    live and crashed the remote compile helper at N=8192, and even the
    strip loop fused into one jit (2,800 dots) crashed it at N=16384.
    L is sliced once on device; strips pass row views of the slices.
    The measured value floors at the GEMM's own method error
    (~n·2^(−s·w) relative) — default s=7 keeps that floor ~1e-12 at
    N≈64k, comfortably under the 1e-10 gate it certifies."""
    n = ah.shape[0]
    row_chunk = min(row_chunk, n)
    sl = _jit_slices(lh, ll, s=s, w=w)
    num = jnp.zeros((), _F32)
    for r0 in range(0, n, row_chunk):
        r1 = min(n, r0 + row_chunk)
        sa = tuple(x[r0:r1] for x in sl)
        num = jnp.maximum(num, _residual_strip(
            ah[r0:r1], al[r0:r1], sa, sl,
            s=s, w=w, precise_deg=precise_deg))
    return num / jax.jit(_df64_rowsum_max)(ah, al)


@functools.partial(jax.jit, static_argnames=("s", "w"))
def _slice_strip_tril(lh_s, ll_s, r0, *, s, w):
    """Slice a row strip of L with an explicit tril mask (global row
    offset ``r0`` is a TRACED scalar, so every full-size strip shares
    ONE compiled program). The mask both enforces the lower-triangle
    contract and makes the strip's columns beyond its last row exactly
    zero, which keeps the fixed full-k block contraction exact."""
    rc, n = lh_s.shape
    cols = lax.broadcasted_iota(jnp.int32, (rc, n), 1)
    rows = r0 + lax.broadcasted_iota(jnp.int32, (rc, n), 0)
    mask = cols <= rows
    zh = jnp.where(mask, lh_s, _F32(0.0))
    zl = jnp.where(mask, ll_s, _F32(0.0))
    return tuple(slice_rows(zh, zl, s=s, w=w)[0])


@functools.partial(
    jax.jit, static_argnames=("s", "w", "precise_deg", "has_al"))
def _residual_block(ah_b, al_b, si, sj, *, s, w, precise_deg, has_al):
    """One (rc, rc) block of |A − L·Lᵀ| (|h|+|l| overbound, matching
    `_df64_rowsum_max`): returns (row sums, column sums) in fp32.
    ``has_al=False``: A is exactly fp32 (frontier probe inputs) — its lo
    plane is identically zero and is synthesized per block instead of
    held as an (n, n) zeros array in HBM; callers pass the SAME array
    object for ``ah_b`` and ``al_b`` so no second rc×rc gather is
    issued for an argument the program discards (ADVICE r4)."""
    ph, pl = df64_matmul_nt(
        None, None, None, None, slices_a=list(si), slices_b=list(sj),
        s=s, w=w, precise_deg=precise_deg)
    if not has_al:
        al_b = jnp.zeros_like(ah_b)
    rh, rl = df_sub(ah_b, al_b, ph, pl)
    r = jnp.abs(rh) + jnp.abs(rl)
    return jnp.sum(r, axis=1), jnp.sum(r, axis=0)


@functools.partial(jax.jit, static_argnames=("has_al",))
def _strip_abs_rowsums(h, l, *, has_al):
    a = jnp.abs(h)
    if has_al:
        a = a + jnp.abs(l)
    return jnp.sum(a, axis=1)


@functools.partial(
    jax.jit, static_argnames=("rc", "s", "w", "precise_deg", "bump"))
def _residual_block_gen(seed, i0, j0, si, sj, *, rc, s, w, precise_deg,
                        bump):
    """:func:`_residual_block` with the A block SYNTHESIZED from the
    generator seed (traced i0/j0 → one compiled program for all blocks)
    — no (n, n) A plane resident at all, which is what lets the
    v6_test-exact full-reconstruction gate run at the dense df64
    frontier (N=32768: the resident-A variant needs A 4.3 GiB next to
    the 8.6 GiB factor pair + slices and RESOURCE_EXHAUSTs)."""
    ah_b = plgsy_tile(seed, i0, j0, rc, rc, bump=bump, dtype=_F32)
    ph, pl = df64_matmul_nt(
        None, None, None, None, slices_a=list(si), slices_b=list(sj),
        s=s, w=w, precise_deg=precise_deg)
    rh, rl = df_sub(ah_b, jnp.zeros_like(ah_b), ph, pl)
    r = jnp.abs(rh) + jnp.abs(rl)
    return jnp.sum(r, axis=1), jnp.sum(r, axis=0)


@functools.partial(jax.jit, static_argnames=("rc", "n", "bump"))
def _strip_abs_rowsums_gen(seed, r0, *, rc, n, bump):
    strip = plgsy_tile(seed, r0, 0, rc, n, bump=bump, dtype=_F32)
    return jnp.sum(jnp.abs(strip), axis=1)


def residual_potrf_df64_blocked(
    ah, al, lh, ll, *, s: int = 7, w: int = 8, precise_deg: int = 3,
    rc: int = 2048, gen_seed: int | None = None, bump: float | None = None,
) -> float:
    """||A − L·Lᵀ||_inf / ||A||_inf in df64 ON DEVICE, block-tiled so the
    FULL slice set of L is never resident — the r4 strip path
    (:func:`residual_potrf_df64`) holds s·n² bf16 of slices alongside
    both (hi, lo) pairs and RESOURCE_EXHAUSTs HBM at N=16384
    (results_r4/df64_probe.jsonl), capping on-chip 1e-10 certification
    at N=8192 (STATUS_r4's r5 candidate; the gate itself is the
    reference's ≤1e-10 contract, v6_test.c:87).

    Tiling: sweep (rc, rc) output blocks of R = A − L·Lᵀ over the LOWER
    triangle only; each block contracts two tril-masked row strips of L
    sliced on the fly (peak slice memory 2·s·rc·n bf16 instead of
    s·n²). A and L·Lᵀ are both symmetric, so a lower block (i, j), i>j,
    also supplies the mirrored upper contributions: its column sums are
    strip-j row-sum contributions from column block i — which means the
    measured value assumes A itself is (bit-level) symmetric. That holds
    for every generated input (``plgsy``/``to_df64`` of a symmetric
    fp64 matrix); the driver symmetrizes ``--input`` matrices before
    routing them here (ADVICE r4). Three compiled programs per distinct
    strip shape — exactly three when rc divides n, one extra shape
    variant of each for a ragged last strip (each program costs a 45-90s
    remote load on this service, so callers should prefer rc | n) —
    each re-invoked from the host, sized for this environment's
    remote-compile limits (see :func:`residual_potrf_df64`'s history
    note). Row sums accumulate on the host in fp64 (values
    ~1e-13·||A||; the fp32 block partials carry them with ~2⁻²⁴
    relative error — far below gate resolution). ``al=None``: A is
    exactly fp32 (device-generated frontier inputs) — no (n, n) zeros
    plane is allocated. ``gen_seed`` (r5): A is STREAMED from the seeded
    generator block-by-block (``_residual_block_gen``, traced offsets →
    still one program) and ``ah``/``al`` are ignored entirely — no A
    plane resident, which unlocks this gate at the dense df64 frontier
    (requires rc | n)."""
    import numpy as np

    gen = gen_seed is not None
    n = lh.shape[0]
    rc = min(rc, n)
    if gen:
        if n % rc:
            raise ValueError(
                f"generator-streamed gate needs rc | n (rc={rc}, n={n})")
        if bump is None:
            bump = float(n)
    nst = -(-n // rc)
    has_al = al is not None
    rowsum = np.zeros(n, np.float64)
    anorm = np.zeros(n, np.float64)
    for i in range(nst):
        r0, r1 = i * rc, min(n, (i + 1) * rc)
        si = _slice_strip_tril(lh[r0:r1], ll[r0:r1], r0, s=s, w=w)
        if gen:
            anorm[r0:r1] = np.asarray(_strip_abs_rowsums_gen(
                gen_seed, r0, rc=rc, n=n, bump=bump), np.float64)
        else:
            ah_i = ah[r0:r1]
            anorm[r0:r1] = np.asarray(_strip_abs_rowsums(
                ah_i, al[r0:r1] if has_al else ah_i,
                has_al=has_al), np.float64)
        for j in range(i + 1):
            c0, c1 = j * rc, min(n, (j + 1) * rc)
            sj = si if j == i else _slice_strip_tril(
                lh[c0:c1], ll[c0:c1], c0, s=s, w=w)
            if gen:
                rs, cs = _residual_block_gen(
                    gen_seed, r0, c0, si, sj, rc=rc, s=s, w=w,
                    precise_deg=precise_deg, bump=bump)
            else:
                ah_b = ah[r0:r1, c0:c1]
                rs, cs = _residual_block(
                    ah_b,
                    al[r0:r1, c0:c1] if has_al else ah_b,
                    si, sj, s=s, w=w, precise_deg=precise_deg,
                    has_al=has_al)
            rowsum[r0:r1] += np.asarray(rs, np.float64)
            if j < i:
                rowsum[c0:c1] += np.asarray(cs, np.float64)
    return float(rowsum.max() / anorm.max())


# ---------------------------------------------------------------------------
# r5: record-size certification gates — packed-native + generator-streamed
# (the r4 record runs carried only a law bound because every gate either
# unpacked the factor to a dense pair or needed a dense A alongside —
# VERDICT r4 weak #1; the gate itself is the reference's ≤1e-10 contract,
# v6_test.c:87)
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("rows", "cols", "bump", "s", "w", "precise_deg"))
def _gen_strip_matvec_df64(seed, i0, xth, xtl, *, rows, cols, bump,
                           s, w, precise_deg):
    """One generated row strip of the seeded SPD matrix times the probe
    block, in df64 — A[i0:i0+rows, :] is synthesized on the fly
    (``plgsy_tile``, traced ``i0`` → ONE compiled program for all
    strips) so no (n, n) A plane is ever resident. Returns the (hi, lo)
    product strip plus the strip's |A| row sums (the ||A||_inf
    contribution, folded into the same program to save a pass)."""
    strip = plgsy_tile(seed, i0, 0, rows, cols, bump=bump, dtype=_F32)
    h, l = df64_matmul_nt(
        strip, jnp.zeros_like(strip), xth, xtl,
        s=s, w=w, precise_deg=precise_deg)
    return h, l, jnp.sum(jnp.abs(strip), axis=1)


@functools.partial(jax.jit, static_argnames=("nb", "s", "w", "precise_deg",
                                             "trans"))
def _packed_matvec_df64(ph, pl, desc, xh, xl, *, nb, s, w, precise_deg,
                        trans):
    """Full df64 matvec L·X (or Lᵀ·X) **directly off the packed column-slab
    pair** in ONE compiled program: a ``fori_loop`` over the triangle's
    nt(nt+1)/2 (nb, nb) tiles, addressed by a host-built descriptor table
    ``desc[c] = (buffer row, global row, column base)``. Per tile:
    dynamic-slice the (hi, lo) tile (diagonal tiles tril-masked — packed
    factors carry stale upper-tile garbage), one tile-sized df64 GEMM
    against the probe slice, compensated (df_add) accumulation into the
    (n, probes) output pair at a dynamic offset. Peak transient memory is
    tile-sized — the packed pair is never unpacked and no dense A is
    needed, which is what lets the packed record sizes (N=40960+) carry a
    measured residual instead of a law bound."""
    n, probes = xh.shape

    def body(c, acc):
        oh, ol = acc
        r0, g0, jb = desc[c, 0], desc[c, 1], desc[c, 2]
        z0 = jnp.zeros_like(r0)  # index literal matching desc's int dtype
        th = lax.dynamic_slice(ph, (r0, z0), (nb, nb))
        tl = lax.dynamic_slice(pl, (r0, z0), (nb, nb))
        rows_i = lax.broadcasted_iota(jnp.int32, (nb, nb), 0)
        cols_i = lax.broadcasted_iota(jnp.int32, (nb, nb), 1)
        keep = jnp.logical_or(g0 != jb, cols_i <= rows_i)
        th = jnp.where(keep, th, _F32(0.0))
        tl = jnp.where(keep, tl, _F32(0.0))
        if trans:
            # z[jb:jb+nb] += tileᵀ · x[g0:g0+nb]
            sh = lax.dynamic_slice(xh, (g0, z0), (nb, probes))
            sl = lax.dynamic_slice(xl, (g0, z0), (nb, probes))
            hh, ll_ = df64_matmul_nt(th.T, tl.T, sh.T, sl.T,
                                     s=s, w=w, precise_deg=precise_deg)
            o = jb
        else:
            # y[g0:g0+nb] += tile · x[jb:jb+nb]
            sh = lax.dynamic_slice(xh, (jb, z0), (nb, probes))
            sl = lax.dynamic_slice(xl, (jb, z0), (nb, probes))
            hh, ll_ = df64_matmul_nt(th, tl, sh.T, sl.T,
                                     s=s, w=w, precise_deg=precise_deg)
            o = g0
        ch = lax.dynamic_slice(oh, (o, z0), (nb, probes))
        cl = lax.dynamic_slice(ol, (o, z0), (nb, probes))
        ch, cl = df_add(ch, cl, hh, ll_)
        oh = lax.dynamic_update_slice(oh, ch, (o, z0))
        ol = lax.dynamic_update_slice(ol, cl, (o, z0))
        return oh, ol

    z = jnp.zeros((n, probes), _F32)
    return lax.fori_loop(0, desc.shape[0], body, (z, jnp.zeros_like(z)))


def _packed_tile_desc(n: int, nb: int):
    """Descriptor table for :func:`_packed_matvec_df64`: one row per
    (nb, nb) tile of the packed triangle — (buffer row offset, global
    row, column base), host-built numpy int32."""
    import numpy as np

    nt = n // nb
    rows = []
    r0 = 0
    for j in range(nt):
        for i in range(j, nt):
            rows.append((r0 + (i - j) * nb, i * nb, j * nb))
        r0 += (nt - j) * nb
    return np.asarray(rows, np.int32)


def _streamed_ax_gate(yh, yl, xth, xtl, n, *, gen_seed, bump, s, w,
                      precise_deg, row_chunk):
    """max_strip ||A·x − y||_inf and ||A||_inf with A streamed from the
    seeded generator (shared tail of both streaming gates below)."""
    num = 0.0
    anorm = 0.0
    for r0 in range(0, n, row_chunk):
        h, l, rs = _gen_strip_matvec_df64(
            gen_seed, r0, xth, xtl, rows=row_chunk, cols=n,
            bump=bump, s=s, w=w, precise_deg=precise_deg)
        rh, rl = df_sub(h, l, yh[r0:r0 + row_chunk], yl[r0:r0 + row_chunk])
        num = max(num, float(jnp.max(jnp.abs(rh + rl))))
        anorm = max(anorm, float(jnp.max(rs)))
    return num, anorm


def freivalds_packed_df64(
    lph, lpl, n: int, nb: int, *, probes: int = 2, seed: int = 71,
    gen_seed: int = 51, bump: float | None = None,
    s: int = 7, w: int = 8, precise_deg: int = 3, row_chunk: int = 1024,
) -> float:
    """Streaming df64 Freivalds gate **for a packed factor pair, with no
    unpack and no dense A**: ``max_p ||(A − L·Lᵀ)·x_p||_inf /
    (||A||_inf·||x_p||_inf)`` where L·(Lᵀ·x) runs directly off the packed
    column slabs (:func:`_packed_matvec_df64`) and A — the seeded
    exactly-fp32 generator matrix the frontier probes factor
    (``plgsy_packed``) — is streamed strip-wise from its seed. Peak extra
    device memory is tile-sized, so the gate runs at the packed record
    sizes where the r4 unpack-based gate RESOURCE_EXHAUSTed (N=40960:
    6.4 GiB pair resident, the unpack path needed 12.8+ GiB more)."""
    import numpy as np

    if n % nb:
        raise ValueError(f"n={n} must be a multiple of nb={nb}")
    if n % row_chunk:
        raise ValueError(f"row_chunk={row_chunk} must divide n={n}")
    if bump is None:
        bump = float(n)
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, probes)).astype(np.float32)
    xh = jnp.asarray(x)
    xl = jnp.zeros_like(xh)
    desc = jnp.asarray(_packed_tile_desc(n, nb))
    kw = dict(nb=nb, s=s, w=w, precise_deg=precise_deg)
    zh, zl = _packed_matvec_df64(lph, lpl, desc, xh, xl, trans=True, **kw)
    yh, yl = _packed_matvec_df64(lph, lpl, desc, zh, zl, trans=False, **kw)
    num, anorm = _streamed_ax_gate(
        yh, yl, xh.T, xl.T, n, gen_seed=gen_seed, bump=bump, s=s, w=w,
        precise_deg=precise_deg, row_chunk=row_chunk)
    return num / (anorm * float(jnp.max(jnp.abs(xh))))


def freivalds_potrf_df64_gen(
    lh, ll, *, probes: int = 2, seed: int = 71, gen_seed: int = 51,
    bump: float | None = None, s: int = 7, w: int = 8,
    precise_deg: int = 3, row_chunk: int = 1024,
) -> float:
    """:func:`freivalds_potrf_df64` for a DENSE factor pair of the seeded
    generator matrix, with A streamed from its seed instead of resident —
    drops the (n, n) A plane (4.3 GiB at N=32768) that made the r4 gate
    RESOURCE_EXHAUST at the dense df64 frontier. Same probe/gate contract;
    L·(Lᵀ·x) uses the existing strip matvecs over the resident pair."""
    import numpy as np

    n = lh.shape[0]
    if n % row_chunk:
        raise ValueError(f"row_chunk={row_chunk} must divide n={n}")
    if bump is None:
        bump = float(n)
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((probes, n)).astype(np.float32)
    xth = jnp.asarray(x)
    xtl = jnp.zeros_like(xth)
    kw = dict(s=s, w=w, precise_deg=precise_deg, row_chunk=row_chunk)
    # z = Lᵀ·x, streamed (no materialized Lᵀ copy — see freivalds_potrf_df64)
    zh, zl = _matvec_t_df64(lh, ll, xth, xtl, **kw)
    yh, yl = _matvec_df64(lh, ll, zh.T, zl.T, **kw)
    num, anorm = _streamed_ax_gate(
        yh, yl, xth, xtl, n, gen_seed=gen_seed, bump=bump, s=s, w=w,
        precise_deg=precise_deg, row_chunk=row_chunk)
    return num / (anorm * float(jnp.max(jnp.abs(xth))))
