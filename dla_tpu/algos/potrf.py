"""Blocked right-looking Cholesky (POTRF), TPU-first.

The reference implements this algorithm three ways (SURVEY §3): as a
Chameleon/StarPU dynamic task DAG (``v6_test.c:54-57``), as an ArmoniK
distributed task DAG (``client_distrib.cpp:506-565``), and as a didactic
hand-blocked C loop (``lapack_dpotrf_remix_c.c:11-52``: per panel —
dsyrk trailing correction, unblocked diagonal factor, dgemm+dtrsm panel
update). Here the *same* right-looking schedule is expressed once as a pure
jitted function and XLA's static schedule replaces the dynamic scheduler
entirely (the design premise of the rebuild — SURVEY §1 L1 "TPU mapping").

Two single-device strategies are provided:

- :func:`potrf_blocked` — the fast path. The outer panel loop is unrolled at
  trace time (the tile count is static), so every panel solve and trailing
  GEMM has its exact static shape: no masking waste, true Cholesky flop
  count. The trailing update is split into column panels of width
  ``update_cols`` so only the lower-trapezoid blocks are computed (a full
  square trailing GEMM would double the update flops); ``update_cols`` trades
  GEMM size (MXU efficiency) against wasted upper-triangle flops.

- :func:`potrf_masked` — the generic path: a ``lax.fori_loop`` over panels
  with dynamic slices and masking, giving a compile-once program whose size
  is independent of the tile count (used where trace-time unrolling is
  unwanted, e.g. very large tile counts or as a loop body under other
  transforms). It does full-width masked updates (≈3× flops) by construction.

Both operate on/return only the lower triangle as meaningful data.
"""

from __future__ import annotations

import functools
from typing import Literal

import jax
import jax.numpy as jnp
from jax import lax

from dla_tpu.ops import gemm, potrf_unblocked, trsm
from dla_tpu.utils import precision as _precision

DiagFactor = Literal["lax", "unblocked", "twolevel"]


def _isc(a) -> bool:
    return jnp.iscomplexobj(a)


def _auto_tb(nb: int, dtype, budget_bytes: int = 10 * 2**20) -> int:
    """Largest trailing-update tile tb ∈ {1024, 512, 256, 128} dividing nb.

    r2 measurement (``results/micro3_r2.jsonl``, with the Mosaic
    vmem_limit bump that unlocked tb=1024 on the remote compiler):
    tb=1024/kb=256/alias=False wins at every precision tier
    (28.8 / 97.5 TF/s RTT-corrected at highest / default vs 26.2 / 55.0
    for the r1 tb=512/kb=512 pick) — larger C tiles raise arithmetic
    intensity past the HBM bound that capped the 1-pass tier."""
    del dtype, budget_bytes  # superseded: Mosaic is given an explicit
    # vmem_limit and the tb=1024/kb=256 footprint is compile-verified on v5e
    for cand in (1024, 512, 256, 128):
        if nb % cand == 0 or cand % nb == 0:
            return min(cand, nb)
    return min(nb, 128)


def _chol_tile(d: jax.Array, diag_factor: DiagFactor, ib: int = 512) -> jax.Array:
    if diag_factor == "unblocked":
        return potrf_unblocked(d)
    if diag_factor == "twolevel":
        return _chol_twolevel(d, ib=ib)
    # symmetrize_input=False: tiles arrive lower-triangle-only (the upper
    # half is zeros by construction); the default symmetrization would
    # silently halve the off-diagonal entries.
    return lax.linalg.cholesky(d, symmetrize_input=False)


def _chol_twolevel(d: jax.Array, ib: int = 512) -> jax.Array:
    """Blocked right-looking factor of one diagonal block with ib-wide inner
    panels: lax cholesky at the ib leaves, everything else inverse-GEMM +
    trailing GEMM on the MXU. ~45× faster than ``lax.linalg.cholesky`` on a
    4096² fp32 tile at default precision on v5e (0.4 ms vs 20 ms,
    ``results/micro3_r2.jsonl``) — XLA's own blocked Cholesky loops batched
    128-wide steps that never fill the MXU."""
    n = d.shape[-1]
    if n <= ib:
        return lax.linalg.cholesky(d, symmetrize_input=False)
    cj = _isc(d)
    out = jnp.zeros_like(d)
    t = d
    eye = jnp.eye(ib, dtype=d.dtype)
    for off in range(0, n, ib):
        w = min(ib, n - off)
        lkk = jnp.tril(lax.linalg.cholesky(t[:w, :w], symmetrize_input=False))
        if off + w < n:
            linv = trsm(1.0, lkk, eye[:w, :w], side="L", transa=False)
            lp = gemm(
                1.0, t[w:, :w], linv, 0.0,
                jnp.zeros((n - off - w, w), d.dtype), transb=True, conjb=cj,
            )
            strip = jnp.concatenate([lkk, lp], axis=0)
            t = gemm(-1.0, lp, lp, 1.0, t[w:, w:], transb=True, conjb=cj)
        else:
            strip = lkk
        out = lax.dynamic_update_slice(out, strip, (off, off))
    return out


@functools.partial(
    jax.jit,
    static_argnames=("nb", "update_cols", "diag_factor", "panel", "trailing", "precision"),
)
def potrf_blocked(
    a: jax.Array,
    *,
    nb: int = 256,
    update_cols: int | None = None,
    diag_factor: DiagFactor = "lax",
    panel: Literal["xla", "pallas"] = "xla",
    trailing: Literal["xla", "pallas"] = "xla",
    precision: str | None = None,
) -> jax.Array:
    """Right-looking blocked Cholesky, panel loop unrolled at trace time.

    Args:
      a: (n, n) SPD matrix; only the lower triangle is read.
      nb: panel (tile) width — the reference's ``NB`` sweep axis
        (``benchmark.c:80``). n need not be a multiple of nb (xla paths).
      update_cols: trailing-update column-panel width (defaults to
        ``max(nb, n // 8)`` rounded to a multiple of nb).
      diag_factor: how the nb×nb diagonal block is factored (xla panel path).
      panel: "pallas" fuses diag factor + inverse + all panel solves into one
        kernel launch (requires n % nb == 0).
      trailing: "pallas" runs each trailing wave as one kernel over
        lower-triangle tile pairs only (requires n % nb == 0).
      precision: explicit matmul-precision override for this trace
        ("default" | "high" | "highest"); None = the env-var policy.

    Returns:
      L (lower triangular, strict upper = 0) with A = L @ L.T.
    """
    n = a.shape[-1]
    if (panel == "pallas" or trailing == "pallas") and n % nb:
        raise ValueError(f"pallas paths require n % nb == 0, got {n} % {nb}")
    if update_cols is None:
        update_cols = max(nb, (n // 8 // nb) * nb or nb)
    with _precision.override(precision):
        return _potrf_blocked_body(
            a, n, nb, update_cols, diag_factor, panel, trailing
        )


def _potrf_blocked_body(a, n, nb, update_cols, diag_factor, panel, trailing):
    out = jnp.tril(a)
    for off in range(0, n, nb):
        w = min(nb, n - off)
        t0 = off + w

        if panel == "pallas":
            from dla_tpu.kernels.pallas_tiles import panel_factor

            newp = panel_factor(out[off:, off : off + w])
            out = out.at[off:, off : off + w].set(newp)
            lp = newp[w:]
        else:
            d = out[off : off + w, off : off + w]
            lkk = jnp.tril(_chol_tile(d, diag_factor))
            out = out.at[off : off + w, off : off + w].set(lkk)
            if t0 >= n:
                break
            # Panel solve: L[t0:, k] = A[t0:, k] @ inv(L_kk)^T (^H for c/z)
            pb = out[t0:, off : off + w]
            lp = trsm(1.0, lkk, pb, side="R", uplo="L", transa=True, conja=_isc(a))
            out = out.at[t0:, off : off + w].set(lp)
        if t0 >= n:
            break

        if trailing == "pallas":
            from dla_tpu.kernels.pallas_tiles import trailing_update_lower

            out = out.at[t0:, t0:].set(
                trailing_update_lower(out[t0:, t0:], lp, tb=nb)
            )
        else:
            # Trailing update on the lower trapezoid, by column panels.
            for c0 in range(t0, n, update_cols):
                cw = min(update_cols, n - c0)
                rows = lp[c0 - t0 :, :]
                cols = lp[c0 - t0 : c0 - t0 + cw, :]
                out = out.at[c0:, c0 : c0 + cw].set(
                    gemm(-1.0, rows, cols, 1.0, out[c0:, c0 : c0 + cw],
                         transb=True, conjb=_isc(a))
                )
    return jnp.tril(out)


@functools.partial(jax.jit, static_argnames=("nb", "diag_factor"))
def potrf_masked(
    a: jax.Array, *, nb: int = 256, diag_factor: DiagFactor = "lax"
) -> jax.Array:
    """Right-looking blocked Cholesky as a single ``fori_loop`` over panels.

    Program size is O(1) in the tile count (vs O(Nb) for the unrolled path);
    every iteration does a full-height panel solve and a full-matrix masked
    trailing update, which is the compile-time/flops tradeoff documented in
    the module docstring.
    """
    n = a.shape[-1]
    if n % nb != 0:
        raise ValueError(f"potrf_masked requires n % nb == 0, got {n} % {nb}")
    ntiles = n // nb
    rows = jnp.arange(n)[:, None]

    def body(k, acc):
        off = k * nb
        panel = lax.dynamic_slice(acc, (0, off), (n, nb))
        diag = lax.dynamic_slice(panel, (off, jnp.zeros_like(off)), (nb, nb))
        lkk = jnp.tril(_chol_tile(diag, diag_factor))
        sol = trsm(1.0, lkk, panel, side="R", uplo="L", transa=True, conja=_isc(a))
        below = rows >= off + nb
        newpanel = jnp.where(below, sol, jnp.zeros((), acc.dtype))
        newpanel = lax.dynamic_update_slice(newpanel, lkk, (off, 0))
        acc = lax.dynamic_update_slice(acc, newpanel, (0, off))
        lp = jnp.where(below, newpanel, jnp.zeros((), acc.dtype))
        acc = gemm(-1.0, lp, lp, 1.0, acc, transb=True, conjb=_isc(a))
        return acc

    out = lax.fori_loop(0, ntiles, body, jnp.tril(a))
    return jnp.tril(out)


def _blocktrsm_panel(lkk, b, *, ib: int = 512):
    """Blocked TRSM: X·L^T = B with only the ib×ib diagonal blocks of L
    inverted — X[:, j] = (B[:, j] − X[:, <j]·L[j, <j]^T)·inv(L_jj)^T. Half
    the flops of the full inverse-GEMM path and all of them MXU GEMMs
    (measured 17.4 ms vs 33.5 ms at 24576×4096 fp32-highest on v5e,
    ``results/micro_r2.jsonl``)."""
    w = lkk.shape[0]
    cj = _isc(lkk)  # Hermitian (c/z) solve: X·Lᴴ = B
    ib = min(ib, w)
    eye = jnp.eye(ib, dtype=lkk.dtype)
    x = jnp.zeros_like(b)
    for off in range(0, w, ib):
        dinv = trsm(1.0, lkk[off : off + ib, off : off + ib], eye, side="L", transa=False)
        rhs = b[:, off : off + ib]
        if off:
            rhs = gemm(-1.0, x[:, :off], lkk[off : off + ib, :off], 1.0, rhs, transb=True, conjb=cj)
        x = x.at[:, off : off + ib].set(
            gemm(1.0, rhs, dinv, 0.0, jnp.zeros_like(rhs), transb=True, conjb=cj)
        )
    return x


@functools.partial(
    jax.jit,
    static_argnames=(
        "nb", "update_cols", "diag_factor", "panel", "trailing", "tb", "kb",
        "trailing_alias", "precision", "ib",
    ),
)
def potrf_shrink(
    a: jax.Array,
    *,
    nb: int = 512,
    update_cols: int | None = None,
    diag_factor: DiagFactor = "lax",
    panel: Literal["xla", "pallas", "invgemm", "blocktrsm"] = "xla",
    trailing: Literal["xla", "pallas"] = "xla",
    tb: int | None = None,
    kb: int | None = None,
    trailing_alias: bool = False,
    precision: str | None = None,
    ib: int = 512,
) -> jax.Array:
    """Right-looking Cholesky on a *shrinking* trailing matrix — the
    compile-friendliest formulation.

    Unlike :func:`potrf_blocked`, which updates an (n, n) buffer in place
    via dynamic-update-slices, this variant re-materializes the shrinking
    trailing matrix functionally each panel step (slices + one GEMM; no DUS
    chain for XLA's copy-insertion to chew on) and assembles L from column
    strips at the end. Extra cost: the trailing update is computed on the
    full trailing square (2× the SYRK flops — still ~2N³/3 total MXU work)
    and the trailing matrix is rewritten per step (~N³/(3·nb) HBM traffic,
    negligible for nb ≥ 256). Input may be lower-only; the trailing square
    is kept symmetric internally.
    """
    n = a.shape[-1]
    del update_cols  # accepted for interface parity; shrink updates square
    if (panel == "pallas" or trailing == "pallas") and n % nb:
        raise ValueError(f"pallas paths require n % nb == 0, got {n} % {nb}")
    with _precision.override(precision):
        cj = _isc(a)
        if trailing != "pallas":
            # the full-square XLA trailing GEMM needs a symmetric (Hermitian
            # for c/z) trailing block, rebuilt from the meaningful (lower)
            # triangle.
            t = jnp.tril(a)
            refl = jnp.tril(t, -1).swapaxes(-1, -2)
            t = t + (jnp.conj(refl) if cj else refl)
        else:
            # the pallas trailing path never reads above the diagonal: the
            # diag factor / panel solves consume only lower entries, and the
            # kernel visits lower tile pairs (diag-tile upper elements are
            # updated in place but never read downstream). Skipping the
            # tril masks saves two full-matrix passes (2×12.8 ms of the
            # 291 ms N=32768 step — r3 xprof breakdown).
            t = a
        # finished column strips land in a preallocated output (one
        # dynamic-update-slice per panel — Nb of them is compile-cheap, unlike
        # the per-op DUS chains of potrf_blocked) so peak memory is
        # out + two trailing copies (~2N²) instead of strips + trailing (~3N²).
        out = jnp.zeros((n, n), a.dtype)
        for off in range(0, n, nb):
            m = n - off
            w = min(nb, m)
            if panel == "pallas":
                from dla_tpu.kernels.pallas_tiles import panel_factor

                strip = panel_factor(t[:, :w])  # fused diag factor + solves
                lp = strip[w:]
            elif panel == "invgemm" and m > w:
                # TRSM-as-GEMM: one nb×nb triangular solve against I (cheap),
                # then the tall panel solve is a plain MXU GEMM.
                lkk = jnp.tril(_chol_tile(t[:w, :w], diag_factor, ib=ib))
                linv = trsm(1.0, lkk, jnp.eye(w, dtype=a.dtype), side="L", transa=False)
                lp = gemm(1.0, t[w:, :w], linv, 0.0, jnp.zeros((m - w, w), a.dtype), transb=True, conjb=cj)
                strip = jnp.concatenate([lkk, lp], axis=0)
            elif panel == "blocktrsm" and m > w:
                lkk = jnp.tril(_chol_tile(t[:w, :w], diag_factor, ib=ib))
                lp = _blocktrsm_panel(lkk, t[w:, :w], ib=ib)
                strip = jnp.concatenate([lkk, lp], axis=0)
            else:
                lkk = jnp.tril(_chol_tile(t[:w, :w], diag_factor, ib=ib))
                if m > w:
                    lp = trsm(1.0, lkk, t[w:, :w], side="R", uplo="L", transa=True, conja=cj)
                    strip = jnp.concatenate([lkk, lp], axis=0)  # (m, w)
                else:
                    lp = None
                    strip = lkk
            out = lax.dynamic_update_slice(out, strip, (off, off))
            if m > w:
                if trailing == "pallas":
                    from dla_tpu.kernels.pallas_tiles import trailing_update_lower

                    # alias=False leaves the unvisited upper-triangle tiles
                    # undefined — safe here: every later read of the trailing
                    # square (diag block, panel column, lower pairs) touches
                    # only lower-triangle tiles.
                    # alias=False default: measured ~10% faster on v5e (the
                    # aliased writeback serializes the next block's prefetch)
                    # and safe here — shrink never reads upper-triangle tiles
                    t = trailing_update_lower(
                        t[w:, w:], lp, tb=tb or _auto_tb(nb, a.dtype),
                        kb=kb if kb is not None else min(nb, 256),
                        alias=trailing_alias,
                        vmem_limit_bytes=100 * 2**20,
                    )
                else:
                    t = gemm(-1.0, lp, lp, 1.0, t[w:, w:], transb=True, conjb=cj)
        # `out` is lower-triangular by construction: it starts as zeros and
        # receives only [tril(L_kk); below-diagonal solve] strips — no final
        # tril pass needed (another 12.8 ms full-matrix pass saved).
        return out


@functools.partial(
    jax.jit,
    static_argnames=(
        "nb", "tb", "kb", "diag_factor", "precision", "ib", "panel", "panel_ib",
    ),
    donate_argnums=0,
)
def potrf_inplace(
    a: jax.Array,
    *,
    nb: int = 8192,
    tb: int = 1024,
    kb: int = 256,
    diag_factor: DiagFactor = "twolevel",
    precision: str | None = None,
    ib: int = 512,
    panel: Literal["auto", "blocktrsm", "pallas"] = "auto",
    panel_ib: int = 256,
) -> jax.Array:
    """Single-buffer right-looking Cholesky: peak device memory ≈ one
    (n, n) buffer plus one column panel.

    The memory-bound in-core formulation: ``potrf_shrink`` re-materializes
    the shrinking trailing square (~3·N² peak — fast, but caps fp32 at
    N≈45k on a 16 GiB v5e), while here the trailing update runs **in place
    on the full buffer** through the aliased Pallas kernel
    (``trailing_update_lower(origin=...)``) and panels land via
    dynamic-update-slice on the donated input. This unlocks the BASELINE
    north-star size **N=65536 in-core with bf16 storage** (8.6 GiB matrix)
    — the storage-precision study configuration (VERDICT r3 #3).

    For ``bfloat16`` input the per-panel compute (diag factor + blocked
    TRSM) upcasts to fp32 tile-locally (the O(N·nb²) terms); the O(N³)
    trailing MXU work reads/writes bf16 with fp32 accumulation natively.

    The strict upper triangle of the result is *passed through from the
    input*, not zeroed — only ``tril(out)`` is meaningful (same contract as
    the reference's lower-triangle descriptors, ``v6_test.c`` semantics).
    """
    n = a.shape[-1]
    if n % nb or nb % tb:
        raise ValueError(f"need n % nb == 0 and nb % tb == 0, got {n}/{nb}/{tb}")
    from dla_tpu.kernels.pallas_tiles import panel_apply, trailing_update_lower

    # "auto" = the XLA blocktrsm. The fused Pallas alternative
    # (kernels.panel_apply, panel="pallas") measured FASTER in isolation
    # (54 vs 30-36 TF/s logical at the headline panel shapes,
    # results_r3/panel_apply.jsonl) but ~1% SLOWER end-to-end in an
    # interleaved A/B at the headline config (results_r3/panel_ab.jsonl:
    # 54.9 vs 54.4 TF/s medians) — XLA overlaps/fuses the small panel dots
    # with the surrounding steps better than a separate kernel launch can.
    # Same lesson as ROADMAP r1's two-level in-kernel factor: kernel-local
    # wins lose end-to-end here; measure through bench.py.
    panel_ib = min(panel_ib, nb)
    if panel == "auto":
        panel = "blocktrsm"
    if panel == "pallas":
        ctype0 = jnp.float32 if a.dtype == jnp.bfloat16 else a.dtype
        if not (ctype0 == jnp.float32 and nb % panel_ib == 0 and nb <= 2048):
            raise ValueError(
                "panel='pallas' needs real fp32 compute, nb % panel_ib == 0 "
                f"and nb <= 2048; got dtype={a.dtype}, nb={nb}, "
                f"panel_ib={panel_ib}"
            )

    with _precision.override(precision):
        compute32 = a.dtype == jnp.bfloat16
        ctype = jnp.float32 if compute32 else a.dtype
        out = a
        for off in range(0, n, nb):
            w = nb
            d = out[off : off + w, off : off + w].astype(ctype)
            lkk = jnp.tril(_chol_tile(d, diag_factor, ib=ib))
            out = lax.dynamic_update_slice(
                out, lkk.astype(out.dtype), (off, off)
            )
            if off + w >= n:
                break
            pb = out[off + w :, off : off + w].astype(ctype)
            if panel == "pallas":
                lp = panel_apply(
                    lkk, pb, ib=panel_ib, tb=min(1024, nb)
                ).astype(out.dtype)
            else:
                lp = _blocktrsm_panel(lkk, pb, ib=ib).astype(out.dtype)
            out = lax.dynamic_update_slice(out, lp, (off + w, off))
            out = trailing_update_lower(
                out, lp, tb=tb, kb=min(kb, nb), alias=True,
                origin=(off + w) // tb, vmem_limit_bytes=100 * 2**20,
            )
        return out


def potrf(
    a: jax.Array,
    *,
    nb: int = 256,
    mode: Literal["blocked", "masked", "shrink", "inplace"] = "blocked",
    uplo: str = "L",
    **kw,
) -> jax.Array:
    """Factor an SPD/HPD matrix: A = L·L^T (L·L^H for c/z), returning the
    ``uplo`` triangle of the factor.

    The top-level entry mirroring ``CHAMELEON_dpotrf_Tile(uplo, descA)``
    (``v6_test.c:57``; uplo map L/U at ``v3_script_cholesky_x_arg_gpt.c:
    35-42``). ``nb`` plays the role of the descriptor tile size.

    ``uplo='U'``: the meaningful data of ``a`` is its *upper* triangle
    (A = UᴴU); implemented as the lower factorization of the reflected
    matrix — two transposes around the same kernel path, no second
    algorithm to maintain.

    ``uplo='B'`` (Both, from the reference's uplo map
    ``v3_script_cholesky_x_arg_gpt.c:35-42``): factor and return *both*
    triangles — L in the lower, Lᴴ in the upper (one shared diagonal), so
    the result reads as a full matrix without a tril/triu step.
    """
    u = uplo.upper()
    if u == "B":
        l = potrf(a, nb=nb, mode=mode, uplo="L", **kw)
        upper = jnp.conj(jnp.tril(l, -1)).swapaxes(-1, -2)
        return l + upper
    if u == "U":
        al = jnp.conj(jnp.triu(a)).swapaxes(-1, -2)
        l = potrf(al, nb=nb, mode=mode, uplo="L", **kw)
        return jnp.conj(l).swapaxes(-1, -2)
    if u != "L":
        raise ValueError(f"uplo must be 'L', 'U', or 'B', got {uplo!r}")
    if mode == "blocked":
        return potrf_blocked(a, nb=nb, **kw)
    if mode == "shrink":
        return potrf_shrink(a, nb=nb, **kw)
    if mode == "inplace":
        # potrf_inplace donates its input (that is its point); the public
        # non-mutating potrf() contract gets a defensive copy, and tril
        # restores the zeros-above contract (the raw function passes the
        # upper triangle through)
        # trailing tile 1024 is the measured-fastest grid at bench NB
        # (8192); fall back to nb itself when 1024 doesn't divide it
        tb = kw.pop("tb", None) or (1024 if nb % 1024 == 0 else nb)
        return jnp.tril(potrf_inplace(jnp.array(a), nb=nb, tb=tb, **kw))
    if mode == "masked":
        n = a.shape[-1]
        if n % nb:
            pad = nb - n % nb
            ap = jnp.zeros((n + pad, n + pad), a.dtype)
            ap = ap.at[:n, :n].set(jnp.tril(a))
            ap = ap.at[jnp.arange(n, n + pad), jnp.arange(n, n + pad)].set(1)
            return potrf_masked(ap, nb=nb, **kw)[:n, :n]
        return potrf_masked(a, nb=nb, **kw)
    raise ValueError(f"unknown mode {mode!r}")
