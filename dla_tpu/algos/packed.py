"""Packed (triangle-only) storage: POTRI / solves on half the memory.

TPU-native analogue of LAPACK's packed/RFP routine family (``dpptrf``/
``dtptri``/``dsppmv``...), built for the serving regime the explicit-
inverse study opened (docs/STATUS_r3.md session 8): a resident symmetric
A⁻¹ or triangular factor occupies n(n+tb)/2 elements instead of n² —
halving HBM for resident serving state and, in the HBM-bound narrow-query
regime, halving the bytes each query streams. The reference's descriptors
are full dense allocations with lower-triangle *semantics* only
(``v6_test.c:41-47`` allocates N² and touches the lower triangle;
``client_distrib.cpp:280-309`` ships full square tiles) — packed storage
is capability beyond it, motivated by the same memory wall that drove its
out-of-core split.

Layout: **column-slab packed lower triangle** with block size ``tb``
(``n % tb == 0``). Block-column ``j`` is stored as the dense
``((nt-j)·tb, tb)`` slab ``A[j·tb:, j·tb:(j+1)·tb]``, row-major,
concatenated into one flat buffer. Every algorithm below touches only
*contiguous, statically-sized* slices of that buffer — no gather, no
dynamic shapes — so XLA sees a short unrolled program of large MXU GEMMs
(the same design rule as ``potrf_inplace``):

- :func:`trtri_packed` — K = L⁻¹, column-oriented right-looking forward
  substitution (only column slabs of L are read; in-place safe).
- :func:`lauum_packed` — A⁻¹ = KᵀK lower triangle (one GEMM per tile
  column pair; in-place safe).
- :func:`potri_packed` — the two composed: packed factor → packed
  inverse, ~2·n³/3 flops vs the dense path's ~2.5·n³.
- :func:`solve_inverse_packed` — X = A⁻¹·B from the *packed symmetric*
  inverse: per block column one lower-apply GEMM and one transposed
  strict-upper GEMM — streams n²/2 elements per query.
- :func:`potrs_packed` — forward+back substitution from the packed
  factor (the packed ``dpotrs``).

All precision handling matches the dense paths: dots run at
``DLA_TPU_MATMUL_PRECISION`` via :mod:`dla_tpu.ops`, bf16 storage
upcasts slab-locally to fp32 compute.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from dla_tpu.ops import gemm, trsm


def packed_len(n: int, tb: int) -> int:
    """Element count of the packed triangle: n·(n+tb)/2."""
    _check(n, tb)
    nt = n // tb
    return tb * tb * nt * (nt + 1) // 2


def packed_rows(n: int, tb: int) -> int:
    """Leading dim of the packed (rows, tb) buffer: n·(n+tb)/(2·tb)."""
    return packed_len(n, tb) // tb


def _check(n: int, tb: int):
    if n % tb:
        raise ValueError(f"n={n} must be a multiple of tb={tb}")


def _row_offset(j: int, nt: int, tb: int) -> int:
    """Row offset of block-column j's slab in the (rows, tb) buffer
    (static Python int)."""
    return tb * (j * nt - j * (j - 1) // 2)


def col_slab(packed: jax.Array, j: int, n: int, tb: int) -> jax.Array:
    """Block-column j as its ((nt-j)·tb, tb) row range — a pure static
    row slice of the 2-D buffer, no reshape (a 1-D layout forced XLA to
    materialize a full-buffer reshape temp at N=65536 — the 2-D
    representation keeps every access a slice/DUS the compiler can do
    in place)."""
    nt = n // tb
    r0 = _row_offset(j, nt, tb)
    return packed[r0 : r0 + (nt - j) * tb]


def _set_col(packed: jax.Array, j: int, slab: jax.Array, n: int, tb: int):
    nt = n // tb
    r0 = _row_offset(j, nt, tb)
    return lax.dynamic_update_slice(
        packed, slab.astype(packed.dtype), (r0, 0)
    )


def pack_tri(a: jax.Array, tb: int) -> jax.Array:
    """Dense (n, n) → packed lower triangle, a (n·(n+tb)/(2·tb), tb)
    2-D buffer (reads only tril(a))."""
    n = a.shape[-1]
    _check(n, tb)
    nt = n // tb
    return jnp.concatenate(
        [a[j * tb :, j * tb : (j + 1) * tb] for j in range(nt)], axis=0
    )


def unpack_tri(packed: jax.Array, n: int, tb: int) -> jax.Array:
    """Packed → dense lower-triangular (strict upper zeroed)."""
    _check(n, tb)
    nt = n // tb
    out = jnp.zeros((n, n), packed.dtype)
    for j in range(nt):
        out = lax.dynamic_update_slice(
            out, col_slab(packed, j, n, tb), (j * tb, j * tb)
        )
    # the diagonal blocks carry whatever the source had above the
    # diagonal — mask to the lower triangle for a clean contract
    return jnp.tril(out)


def _ctype(dtype):
    return jnp.float32 if dtype == jnp.bfloat16 else dtype


def _diag_invs(packed: jax.Array, n: int, tb: int) -> list[jax.Array]:
    """inv(L[k,k]) for every diagonal block (lower-triangular inverses),
    computed from the packed buffer before any overwrite. Large tiles
    route through the unrolled block-inverse solve — XLA's native
    triangular_solve emits a remote-compile-hostile program at size
    (same trade as the dense ``potri``/``potrs`` blocked paths)."""
    from dla_tpu.algos.solve import _solve_lower_blocked

    nt = n // tb
    ct = _ctype(packed.dtype)
    eye = jnp.eye(tb, dtype=ct)
    out = []
    for k in range(nt):
        dk = col_slab(packed, k, n, tb)[:tb].astype(ct)
        if tb > 1024:
            out.append(_solve_lower_blocked(dk, eye, trans=False, ib=512))
        else:
            # float32-pinned: on TPU the solve's internal dots otherwise
            # run one bf16 pass (~5e-4 relative), which caps every
            # refinement built on these inverses at ~eps_t^(r+1) — the
            # df64 packed serve measured 2.09e-10 (gate FAIL) on chip
            # before this pin (r5, results_r5/df64_probe.jsonl)
            with jax.default_matmul_precision("float32"):
                out.append(trsm(1.0, dk, eye, side="L", uplo="L",
                                transa=False))
    return out


def trtri_packed(lp: jax.Array, n: int, tb: int) -> jax.Array:
    """K = L⁻¹ in packed space (in-place safe: column j of the output
    replaces column j of the input after it is fully computed; later
    columns read only columns > j). Column-oriented right-looking
    substitution — every operand is a contiguous column-slab slice."""
    _check(n, tb)
    nt = n // tb
    ct = _ctype(lp.dtype)
    dinv = _diag_invs(lp, n, tb)
    out = lp
    for j in range(nt):
        rows = (nt - j) * tb
        x = jnp.zeros((rows, tb), ct)
        x = x.at[:tb].set(dinv[j])
        if j + 1 < nt:
            strict = col_slab(out, j, n, tb)[tb:].astype(ct)
            x = x.at[tb:].set(-gemm(1.0, strict, dinv[j], 0.0, x[tb:]))
        # x now holds the first column-step; continue the substitution
        for k in range(j + 1, nt):
            i0 = (k - j) * tb
            xk = gemm(1.0, dinv[k], x[i0 : i0 + tb], 0.0, x[i0 : i0 + tb])
            x = x.at[i0 : i0 + tb].set(xk)
            if k + 1 < nt:
                strict = col_slab(out, k, n, tb)[tb:].astype(ct)
                x = x.at[i0 + tb :].set(
                    gemm(-1.0, strict, xk, 1.0, x[i0 + tb :])
                )
        out = _set_col(out, j, x, n, tb)
    return out


def lauum_packed(kp: jax.Array, n: int, tb: int) -> jax.Array:
    """Lower triangle of KᵀK from packed K (the lauum-of-inverse step of
    POTRI). One (tb, (nt-i)·tb)·((nt-i)·tb, tb) GEMM per output tile;
    in-place safe (column j is overwritten only after its slab is done,
    from columns ≥ j of K)."""
    _check(n, tb)
    nt = n // tb
    ct = _ctype(kp.dtype)
    out = kp
    for j in range(nt):
        colj = col_slab(out, j, n, tb).astype(ct)
        blocks = []
        for i in range(j, nt):
            coli = col_slab(out, i, n, tb).astype(ct)  # rows k = i..nt-1
            cj_tail = colj[(i - j) * tb :]  # rows k = i..nt-1
            z = jnp.zeros((tb, tb), ct)
            blocks.append(gemm(1.0, coli, cj_tail, 0.0, z, transa=True,
                               conja=jnp.iscomplexobj(kp)))
        out = _set_col(out, j, jnp.concatenate(blocks, axis=0), n, tb)
    return out


def potri_packed(lp: jax.Array, n: int, tb: int) -> jax.Array:
    """Packed factor → packed symmetric inverse: A⁻¹ = L⁻ᵀ·L⁻¹ computed
    entirely in packed space (~2·n³/3 flops; peak memory one packed
    buffer + one column slab when the caller donates ``lp``)."""
    return lauum_packed(trtri_packed(lp, n, tb), n, tb)


def solve_inverse_packed(
    sp: jax.Array, b: jax.Array, n: int, tb: int
) -> jax.Array:
    """Serving apply X = A⁻¹·B from the *packed symmetric* inverse:
    streams n(n+tb)/2 elements of A⁻¹ per query — half the dense
    :func:`~dla_tpu.algos.potri.solve_inverse` GEMM's bytes, which is
    the whole cost in the HBM-bound narrow-query regime. Per block
    column j: X[j·tb:] += S[:, j]·B_j (lower, incl. diagonal) and
    X_j += S[j+1:, j]ᵀ·B[(j+1)·tb:] (the strict upper via symmetry)."""
    _check(n, tb)
    nt = n // tb
    vec = b.ndim == 1
    bb = b[:, None] if vec else b
    ct = _ctype(sp.dtype)
    bb = bb.astype(ct) if bb.dtype != ct else bb
    cj = jnp.iscomplexobj(sp)
    x = jnp.zeros((n, bb.shape[-1]), ct)
    for j in range(nt):
        colj = col_slab(sp, j, n, tb).astype(ct)
        bj = bb[j * tb : (j + 1) * tb]
        x = x.at[j * tb :].set(gemm(1.0, colj, bj, 1.0, x[j * tb :]))
        if j + 1 < nt:
            x = x.at[j * tb : (j + 1) * tb].set(
                gemm(1.0, colj[tb:], bb[(j + 1) * tb :], 1.0,
                     x[j * tb : (j + 1) * tb], transa=True, conja=cj)
            )
    return x[:, 0] if vec else x


def potrs_packed(
    lp: jax.Array, b: jax.Array, n: int, tb: int
) -> jax.Array:
    """Solve A·X = B from the packed factor (packed ``dpotrs``):
    forward then back substitution over column slabs, diagonal blocks
    applied via their precomputed triangular inverses (the same
    block-inverse trade as the dense ``potrs(blocked=True)``)."""
    _check(n, tb)
    nt = n // tb
    vec = b.ndim == 1
    bb = b[:, None] if vec else b
    ct = _ctype(lp.dtype)
    bb = bb.astype(ct) if bb.dtype != ct else bb
    cj = jnp.iscomplexobj(lp)
    dinv = _diag_invs(lp, n, tb)
    # forward: L·Y = B
    y = bb
    for k in range(nt):
        yk = gemm(1.0, dinv[k], y[k * tb : (k + 1) * tb], 0.0,
                  y[k * tb : (k + 1) * tb])
        y = y.at[k * tb : (k + 1) * tb].set(yk)
        if k + 1 < nt:
            strict = col_slab(lp, k, n, tb)[tb:].astype(ct)
            y = y.at[(k + 1) * tb :].set(
                gemm(-1.0, strict, yk, 1.0, y[(k + 1) * tb :])
            )
    # back: Lᵀ·X = Y
    x = y
    for k in reversed(range(nt)):
        rhs = x[k * tb : (k + 1) * tb]
        if k + 1 < nt:
            strict = col_slab(lp, k, n, tb)[tb:].astype(ct)
            rhs = gemm(-1.0, strict, x[(k + 1) * tb :], 1.0, rhs,
                       transa=True, conja=cj)
        x = x.at[k * tb : (k + 1) * tb].set(
            gemm(1.0, dinv[k], rhs, 0.0, rhs, transa=True, conja=cj)
        )
    return x[:, 0] if vec else x


def plgsy_packed(
    n: int, tb: int, *, bump: float | None = None, seed: int = 51,
    dtype=jnp.float32,
) -> jax.Array:
    """Packed lower triangle of the seeded SPD test matrix, generated
    column-slab-wise from the tile-local generator — **no dense (n, n)
    square is ever materialized**, so the packed pipeline (generate →
    :func:`potrf_packed` → :func:`potri_packed` → serve) runs entirely
    in ~n²/2 device memory. Matches ``tril(plgsy(n))`` exactly (the
    generator is tile-local deterministic — ``core_dplgsy.c`` semantics,
    SURVEY §3)."""
    from dla_tpu.ops.lapack_like import plgsy_tile

    _check(n, tb)
    if bump is None:
        bump = float(n)  # same SPD default as plgsy (v6_test.c:46)
    nt = n // tb
    return jnp.concatenate([
        plgsy_tile(
            seed, j * tb, j * tb, (nt - j) * tb, tb, bump=bump, dtype=dtype
        )
        for j in range(nt)
    ], axis=0)


def potrf_packed(
    ap: jax.Array,
    n: int,
    tb: int,
    *,
    diag_factor: str = "twolevel",
    ib: int = 512,
    precision: str | None = None,
    trailing: str = "xla",
    ktb: int = 1024,
    kb: int | None = None,
) -> jax.Array:
    """Right-looking Cholesky **in packed space**: peak device memory ≈
    one packed triangle (n(n+tb)/2 elements) + one column slab, vs
    ``potrf_inplace``'s full n² buffer — extending the in-core frontier
    ~√2× per dtype (f32: N≈61440 dense → ~86k packed on a 15.75 GiB
    v5e). Per step: factor the diagonal tile, blocked-TRSM the panel
    (both reused from the dense path), then one trailing GEMM per
    remaining block column — all operands contiguous column-slab
    slices, so the unrolled program stays short (nt(nt+1)/2 GEMM+DUS).

    bf16 storage upcasts slab-locally to fp32 compute, exactly like
    ``potrf_inplace`` (the O(n³) trailing dots read/write storage dtype
    with fp32 accumulation).

    ``trailing="pallas"`` routes the trailing wave through the aliased
    single-pass packed kernel (:func:`dla_tpu.kernels.pallas_tiles.
    trailing_update_packed`, kernel tile ``ktb``, k-split ``kb``); the
    default ``"xla"`` per-column loop reads and writes every trailing
    element twice per step (slice → GEMM → DUS)."""
    from dla_tpu.algos.potrf import _blocktrsm_panel, _chol_tile
    from dla_tpu.utils import precision as _precision

    _check(n, tb)
    if trailing == "pallas" and jnp.iscomplexobj(ap):
        raise ValueError(
            "trailing='pallas' supports real dtypes only (the kernel "
            "computes P·Pᵀ, not P·Pᴴ); use the default trailing='xla'"
        )
    nt = n // tb
    ct = _ctype(ap.dtype)
    with _precision.override(precision):
        out = ap
        for k in range(nt):
            colk = col_slab(out, k, n, tb)
            lkk = jnp.tril(
                _chol_tile(colk[:tb].astype(ct), diag_factor, ib=ib)
            )
            # NOTE on the exact update form (measured, do not "optimize"
            # blindly): this concat + slice-copy-GEMM-DUS structure is
            # what XLA compiles into an in-place program over the donated
            # buffer (f32 N=65536/73728/81920 all ran on chip). Two
            # attempted memory reductions REGRESSED it to a 17.09 GiB
            # compile-time OOM at f32 N=65536: (a) splitting the column
            # write into separate diag+panel DUS, and (b) replacing the
            # colj-copy trailing update with `.at[rows].add(-prod)` —
            # both break the donation-aliasing chain the scheduler finds
            # for this form (docs/ROADMAP.md negative results).
            if k + 1 < nt:
                lik = _blocktrsm_panel(lkk, colk[tb:].astype(ct), ib=ib)
                newcol = jnp.concatenate([lkk, lik], axis=0)
            else:
                newcol = lkk
            out = _set_col(out, k, newcol, n, tb)
            if trailing == "pallas" and k + 1 < nt:
                from dla_tpu.kernels.pallas_tiles import (
                    trailing_update_packed,
                )

                out = trailing_update_packed(
                    out, lik.astype(out.dtype), n=n, w=tb, k=k,
                    tb=min(ktb, tb), kb=kb,
                    vmem_limit_bytes=100 * 2**20,
                )
                continue
            for j in range(k + 1, nt):
                colj = col_slab(out, j, n, tb)
                sub = lik[(j - k - 1) * tb :]          # rows j..nt-1 of col k
                blk = lik[(j - k - 1) * tb : (j - k) * tb]  # L[j, k]
                upd = gemm(-1.0, sub, blk, 1.0, colj.astype(ct),
                           transb=True,
                           conjb=jnp.iscomplexobj(ap))
                out = _set_col(out, j, upd, n, tb)
        return out


def trmm_packed(
    lp: jax.Array, b: jax.Array, n: int, tb: int, *, trans: bool = False
) -> jax.Array:
    """Y = L·B (or Lᵀ·B / Lᴴ·B) from the packed factor — one GEMM per
    block column (the packed ``dtrmm``, used by the matrix-free
    Freivalds gate below)."""
    _check(n, tb)
    nt = n // tb
    vec = b.ndim == 1
    bb = b[:, None] if vec else b
    ct = _ctype(lp.dtype)
    bb = bb.astype(ct) if bb.dtype != ct else bb
    cj = jnp.iscomplexobj(lp)
    y = jnp.zeros((n, bb.shape[-1]), ct)
    for j in range(nt):
        colj = col_slab(lp, j, n, tb).astype(ct)
        if not trans:
            y = y.at[j * tb :].set(
                gemm(1.0, colj, bb[j * tb : (j + 1) * tb], 1.0, y[j * tb :])
            )
        else:
            y = y.at[j * tb : (j + 1) * tb].set(
                gemm(1.0, colj, bb[j * tb :], 0.0,
                     y[j * tb : (j + 1) * tb], transa=True, conja=cj)
            )
    return y[:, 0] if vec else y


def spd_matvec_streamed(
    x: jax.Array, n: int, *, seed: int = 51, bump: float | None = None,
    cb: int = 1024, dtype=jnp.float32,
) -> jax.Array:
    """A·X for the seeded SPD generator matrix **without materializing
    A**: full (n, cb) column strips are generated on the fly
    (`plgsy_tile`) and accumulated — O(n·cb) device memory. This is the
    device-side analogue of the host streaming-Freivalds probe
    (validate/residual.py), sized for packed-pipeline scales where even
    the packed triangle + A cannot co-reside."""
    from dla_tpu.ops.lapack_like import plgsy_tile

    cb = min(cb, n)
    if n % cb:
        raise ValueError(f"n={n} must be a multiple of cb={cb}")
    if bump is None:
        bump = float(n)
    vec = x.ndim == 1
    xx = x[:, None] if vec else x
    ct = _ctype(xx.dtype)
    xx = xx.astype(ct)
    acc = jnp.zeros((n, xx.shape[-1]), ct)
    for j0 in range(0, n, cb):
        strip = plgsy_tile(seed, 0, j0, n, cb, bump=bump, dtype=ct)
        acc = acc + jnp.matmul(
            strip, xx[j0 : j0 + cb], preferred_element_type=ct,
            precision="highest",
        )
    return acc[:, 0] if vec else acc


def freivalds_packed(
    lp: jax.Array, n: int, tb: int, *, seed: int = 51,
    bump: float | None = None, nprobe: int = 2, key: int = 0,
) -> jax.Array:
    """Matrix-free Freivalds gate for a packed factor of the seeded SPD
    matrix: ||A·x − L·(Lᵀ·x)||_inf / (||A||_1-ish · ||x||_inf) with A
    applied via :func:`spd_matvec_streamed`. Same probe/gate contract
    as the out-of-core and frontier driver validations."""
    from dla_tpu.ops.lapack_like import plgsy_tile

    if bump is None:
        bump = float(n)
    ct = _ctype(lp.dtype)
    cb = 1024 if n % 1024 == 0 else tb
    x = jax.random.normal(jax.random.PRNGKey(key), (n, nprobe), ct)
    ax = spd_matvec_streamed(x, n, seed=seed, bump=bump, cb=cb, dtype=ct)
    y = trmm_packed(lp, trmm_packed(lp, x, n, tb, trans=True), n, tb)
    # ||A||_inf via streamed row sums of |A|
    na = jnp.zeros((n,), ct)
    for j0 in range(0, n, cb):
        strip = plgsy_tile(seed, 0, j0, n, cb, bump=bump, dtype=ct)
        na = na + jnp.sum(jnp.abs(strip), axis=1)
    denom = jnp.max(na) * jnp.max(jnp.abs(x))
    return jnp.max(jnp.abs(ax - y.astype(ct))) / denom


def residual_posv_streamed(
    x: jax.Array, b: jax.Array, n: int, *, seed: int = 51,
    bump: float | None = None, cb: int = 1024,
) -> jax.Array:
    """``||B − A·X||_inf / (||A||_inf·||X||_inf)`` for the seeded SPD
    generator matrix, with A applied and its norm accumulated in
    streamed strips — the solve-path validation when A cannot be
    materialized next to the packed state (same contract as
    ``validate.residual_posv``)."""
    from dla_tpu.ops.lapack_like import plgsy_tile

    if bump is None:
        bump = float(n)
    cb = min(cb, n)
    ct = _ctype(x.dtype)
    ax = spd_matvec_streamed(x, n, seed=seed, bump=bump, cb=cb, dtype=ct)
    na = jnp.zeros((n,), ct)
    for j0 in range(0, n, cb):
        strip = plgsy_tile(seed, 0, j0, n, cb, bump=bump, dtype=ct)
        na = na + jnp.sum(jnp.abs(strip), axis=1)
    denom = jnp.max(na) * jnp.max(jnp.abs(x))
    return jnp.max(jnp.abs(b.astype(ct) - ax)) / denom
