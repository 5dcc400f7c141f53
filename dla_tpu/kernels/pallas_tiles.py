"""Pallas TPU kernels for the four tile ops and fused panel variants.

The reference's task DAG is built from exactly four per-tile kernels
dispatched through Chameleon→StarPU→OpenBLAS/cuBLAS
(``worker_distrib.cpp:238/:323/:416/:511``). Here they are Pallas kernels:

- :func:`potrf_tile`    — unblocked lower Cholesky of one NB×NB tile in
  VMEM (n vectorized VPU rank-1 updates), *fused with* the triangular
  inverse of the factor. Producing inv(L_kk) turns every downstream panel
  TRSM into a plain MXU GEMM (``B @ inv(L)^T``) — the standard
  tile-algorithm transformation; a true triangular solve is
  latency-bound on a systolic array.
- :func:`trsm_tile`     — tile solve against a pre-inverted factor (MXU dot).
- :func:`syrk_tile`     — C ← C − A·A^T on the lower triangle (MXU + mask).
- :func:`gemm_tile`     — C ← C − A_i·A_j^T (MXU).
- :func:`panel_factor`  — fused panel kernel: one ``pallas_call`` factors
  the diagonal tile, keeps inv(L_kk) in VMEM scratch (scratch persists
  across the sequential TPU grid), and streams every below-diagonal panel
  tile through the MXU — the whole panel step of the right-looking
  algorithm in a single kernel launch instead of one StarPU task per tile.
  **Status (honest):** capped at nb ≤ 512 by its VMEM budget and therefore
  NOT on the shipping path — the bench config is NB=8192 with the
  ``blocktrsm`` XLA panel, which beat it end-to-end (docs/ROADMAP.md
  negative results). It remains as the per-tile task-kernel parity point
  and is exercised by tests; ``trailing_update_lower`` is the Pallas
  kernel that actually carries the headline flops.
- :func:`trailing_update_lower` — the trailing SYRK/GEMM wave for one panel
  as a single kernel: a 1D grid over the *lower-triangle tile pairs only*
  (scalar-prefetched (i, j) lists drive the BlockSpec index maps), so no
  flops are spent on the upper triangle that a plain square GEMM would
  compute.

All kernels run in interpret mode off-TPU (CPU tests), compiled Mosaic on
TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dla_tpu.utils.precision import matmul_precision


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pet(dtype):
    """MXU accumulation dtype: fp32 for narrow floats, else the input's."""
    return jnp.float32 if dtype in (jnp.bfloat16, jnp.float16, jnp.float32) else dtype


def _kernel_precision() -> str:
    """Mosaic supports DEFAULT and HIGHEST dot precisions but not HIGH; the
    scalar-column rank-1 dots inside the factor/inverse loops are a rounding
    error of the tile cost, so 'high' simply promotes them to 'highest'."""
    p = matmul_precision()
    return "highest" if p == "high" else p


def _dot_nt(a: jax.Array, b: jax.Array) -> jax.Array:
    """``a @ b.T`` on the MXU honoring the library precision policy, fp32
    accumulation. At ``high`` Mosaic has no native mode, so the 3-pass
    bf16x3 product is emitted explicitly: x = hi(x) + lo(x) in bf16,
    a·bᵀ ≈ ahi·bhiᵀ + ahi·bloᵀ + alo·bhiᵀ (the dropped alo·bloᵀ term is
    ~2⁻³² relative) — the scheme XLA itself uses for HIGH on fp32, at
    ~3× the default-pass throughput cost instead of highest's ~6×."""
    pet = _pet(a.dtype)
    dims = (((1,), (1,)), ((), ()))
    p = matmul_precision()
    if p == "high" and a.dtype == jnp.float32:
        ahi = a.astype(jnp.bfloat16)
        alo = (a - ahi.astype(jnp.float32)).astype(jnp.bfloat16)
        bhi = b.astype(jnp.bfloat16)
        blo = (b - bhi.astype(jnp.float32)).astype(jnp.bfloat16)

        def t(x, y):
            return lax.dot_general(x, y, dims, preferred_element_type=jnp.float32)

        return t(ahi, bhi) + (t(ahi, blo) + t(alo, bhi))
    return lax.dot_general(a, b, dims, preferred_element_type=pet, precision=p)


def _rows_cols(n: int):
    rows = lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return rows, cols


def _factor_lower(a: jax.Array) -> jax.Array:
    """Unblocked lower Cholesky by n vectorized rank-1 updates (VPU).

    Mosaic cannot dynamically index loop-carried *values*, so column j is
    extracted with a masked row-reduction instead of a slice — every
    iteration is dense (n, n) VPU work (~4n³ total elementwise ops per tile;
    tens of microseconds at NB=256). Reads only the lower triangle;
    returns tril(L).
    """
    n = a.shape[-1]
    rows, cols = _rows_cols(n)
    rvec = rows[:, :1]  # (n, 1) — everything stays 2D for Mosaic layouts
    zero = jnp.zeros((), a.dtype)
    pet = _pet(a.dtype)

    def body(j, acc):
        colmask = cols == j
        col = jnp.sum(jnp.where(colmask, acc, zero), axis=1, keepdims=True)
        piv = jnp.sqrt(jnp.sum(jnp.where(rvec == j, col, zero)))
        col = col / piv
        colj = jnp.where(rvec > j, col, zero)  # (n, 1)
        newcol = jnp.where(rvec == j, piv, colj)
        acc = jnp.where(colmask, newcol, acc)
        outer = lax.dot_general(
            colj, colj, (((1,), (1,)), ((), ())), preferred_element_type=pet, precision=_kernel_precision()
        ).astype(a.dtype)
        return acc - outer

    l = lax.fori_loop(0, n, body, a)
    return jnp.where(rows >= cols, l, zero)


def _invert_lower(l: jax.Array) -> jax.Array:
    """inv(L) by column-oriented forward substitution (n rank-1 VPU steps,
    masked extraction — see :func:`_factor_lower`)."""
    n = l.shape[-1]
    rows, cols = _rows_cols(n)
    rvec = rows[:, :1]
    zero = jnp.zeros((), l.dtype)
    pet = _pet(l.dtype)
    eye = jnp.where(rows == cols, jnp.ones((), l.dtype), zero)
    ldiag = jnp.sum(jnp.where(rows == cols, l, zero), axis=1, keepdims=True)

    def body(j, x):
        rowmask = rows == j
        xrow = jnp.sum(jnp.where(rowmask, x, zero), axis=0, keepdims=True)
        piv = jnp.sum(jnp.where(rvec == j, ldiag, zero))
        xrow = xrow / piv
        x = jnp.where(rowmask, xrow, x)
        colj = jnp.where(
            rvec > j,
            jnp.sum(jnp.where(cols == j, l, zero), axis=1, keepdims=True),
            zero,
        )
        outer = lax.dot_general(
            colj, xrow, (((1,), (0,)), ((), ())), preferred_element_type=pet, precision=_kernel_precision()
        ).astype(l.dtype)
        return x - outer

    x = lax.fori_loop(0, n, body, eye)
    return jnp.where(rows >= cols, x, zero)


# ---------------------------------------------------------------------------
# Single-tile kernels (API parity with the reference's 4 task kernels)
# ---------------------------------------------------------------------------


def _potrf_inv_kernel(a_ref, l_ref, linv_ref):
    l = _factor_lower(a_ref[:])
    l_ref[:] = l
    linv_ref[:] = _invert_lower(l)


def potrf_tile(a: jax.Array, *, interpret: bool | None = None):
    """Factor one SPD tile: returns (L, inv(L)). ↔ the reference's POTRF
    task (``worker_distrib.cpp:238``), fused with the inverse."""
    interpret = _interpret() if interpret is None else interpret
    return pl.pallas_call(
        _potrf_inv_kernel,
        out_shape=(
            jax.ShapeDtypeStruct(a.shape, a.dtype),
            jax.ShapeDtypeStruct(a.shape, a.dtype),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(a)


def _trsm_kernel(linv_ref, b_ref, out_ref):
    out_ref[:] = _dot_nt(b_ref[:], linv_ref[:]).astype(out_ref.dtype)


def trsm_tile(linv: jax.Array, b: jax.Array, *, interpret: bool | None = None):
    """B ← B·inv(L)^T given the pre-inverted factor (MXU GEMM). ↔ the
    reference's TRSM task (``worker_distrib.cpp:323``) after the
    solve→multiply transformation."""
    interpret = _interpret() if interpret is None else interpret
    return pl.pallas_call(
        _trsm_kernel,
        out_shape=jax.ShapeDtypeStruct(b.shape, b.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(linv, b)


def _syrk_kernel(c_ref, a_ref, out_ref):
    n = c_ref.shape[0]
    rows, cols = _rows_cols(n)
    upd = c_ref[:] - _dot_nt(a_ref[:], a_ref[:]).astype(c_ref.dtype)
    out_ref[:] = jnp.where(rows >= cols, upd, c_ref[:])


def syrk_tile(c: jax.Array, a: jax.Array, *, interpret: bool | None = None):
    """C ← C − A·A^T on the lower triangle (upper passthrough). ↔ the
    reference's SYRK task (``worker_distrib.cpp:416``)."""
    interpret = _interpret() if interpret is None else interpret
    return pl.pallas_call(
        _syrk_kernel,
        out_shape=jax.ShapeDtypeStruct(c.shape, c.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(c, a)


def _gemm_kernel(c_ref, ai_ref, aj_ref, out_ref):
    out_ref[:] = c_ref[:] - _dot_nt(ai_ref[:], aj_ref[:]).astype(c_ref.dtype)


def gemm_tile(c: jax.Array, ai: jax.Array, aj: jax.Array, *, interpret: bool | None = None):
    """C ← C − A_i·A_j^T. ↔ the reference's GEMM task
    (``worker_distrib.cpp:511``)."""
    interpret = _interpret() if interpret is None else interpret
    return pl.pallas_call(
        _gemm_kernel,
        out_shape=jax.ShapeDtypeStruct(c.shape, c.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(c, ai, aj)


# ---------------------------------------------------------------------------
# Fused panel factor: diag POTRF + inverse + all panel TRSMs in one launch
# ---------------------------------------------------------------------------


def _panel_kernel(p_ref, out_ref, linv_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        l = _factor_lower(p_ref[:])
        out_ref[:] = l
        linv_ref[:] = _invert_lower(l)

    @pl.when(i > 0)
    def _():
        out_ref[:] = _dot_nt(p_ref[:], linv_ref[:]).astype(out_ref.dtype)


def panel_factor(panel: jax.Array, *, interpret: bool | None = None) -> jax.Array:
    """Factor a column panel [[A_kk], [A_ik...]] of shape (m, nb), m a
    multiple of nb: block 0 becomes L_kk (and its inverse is kept in VMEM
    scratch across the sequential grid), every other block becomes
    A_ik·inv(L_kk)^T on the MXU. One kernel launch replaces the reference's
    1 POTRF + (m/nb − 1) TRSM tasks for the panel."""
    m, nb = panel.shape
    if m % nb:
        raise ValueError(f"panel rows {m} must be a multiple of nb={nb}")
    item = jnp.dtype(panel.dtype).itemsize
    if 2 * 3 * nb * nb * item > 14 * 2**20:  # in+out+scratch, double-buffered
        raise ValueError(
            f"panel_factor nb={nb} exceeds the VMEM budget (three nb×nb "
            f"buffers, pipelined); use nb ≤ 512 for float32"
        )
    interpret = _interpret() if interpret is None else interpret
    nblk = m // nb
    return pl.pallas_call(
        _panel_kernel,
        grid=(nblk,),
        out_shape=jax.ShapeDtypeStruct(panel.shape, panel.dtype),
        in_specs=[
            pl.BlockSpec((nb, nb), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((nb, nb), lambda i: (i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((nb, nb), panel.dtype)],
        interpret=interpret,
    )(panel)


# ---------------------------------------------------------------------------
# Trailing update over lower-triangle tile pairs only
# ---------------------------------------------------------------------------


def _trailing_kernel(i_ref, j_ref, c_ref, pi_ref, pj_ref, out_ref):
    del i_ref, j_ref  # consumed by the index maps
    ks = pl.program_id(1)
    upd = _dot_nt(pi_ref[:], pj_ref[:]).astype(c_ref.dtype)

    @pl.when(ks == 0)
    def _():
        out_ref[:] = c_ref[:] - upd

    @pl.when(ks > 0)
    def _():
        # k-minor grid order revisits the same C block consecutively, so the
        # VMEM output buffer accumulates across the k-split steps
        out_ref[:] = out_ref[:] - upd


@functools.lru_cache(maxsize=None)
def _lower_pairs(nt: int) -> tuple[np.ndarray, np.ndarray]:
    pairs = [(i, j) for j in range(nt) for i in range(j, nt)]
    arr = np.asarray(pairs, dtype=np.int32)
    return arr[:, 0], arr[:, 1]


def trailing_update_lower(
    c: jax.Array,
    p: jax.Array,
    *,
    tb: int = 256,
    kb: int | None = None,
    alias: bool = True,
    origin: int = 0,
    interpret: bool | None = None,
    vmem_limit_bytes: int | None = None,
    dimension_semantics: tuple | None = None,
) -> jax.Array:
    """C[lower tiles] ← C − P·P^T, visiting only tile pairs (i ≥ j) of the
    tb×tb tile grid — the per-panel trailing SYRK/GEMM wave as one kernel,
    spending no MXU cycles on the upper triangle. Upper-triangle tiles of C
    pass through unchanged (input/output aliased).

    ``kb`` splits the panel's contraction dimension so wide panels fit VMEM
    with large tb (the C block is revisited across consecutive k-steps and
    accumulates in VMEM — standard matmul k-split).

    ``alias=False`` writes into a fresh output buffer instead of aliasing C:
    measured ~20% faster on v5e (aliasing serializes the next block's
    prefetch against the writeback), but the *unvisited upper-triangle
    tiles are then undefined* — only callers that never read the upper
    triangle (e.g. ``potrf_shrink``) may use it.

    ``origin`` (tile units): update the trailing submatrix starting at tile
    (origin, origin) of a FULL (m, m) buffer in place — the in-place
    formulation ``potrf_inplace`` uses so the shrinking trailing square is
    never materialized as a slice copy (peak memory one N² buffer; the
    panel ``p`` still has exactly the trailing rows). Requires ``alias``
    (unvisited tiles must pass through).
    """
    m, m2 = c.shape
    if m != m2:
        raise ValueError("c must be square")
    if m % tb:
        raise ValueError(f"trailing size {m} must be a multiple of tb={tb}")
    if origin and not alias:
        raise ValueError("origin needs alias=True (untouched tiles must "
                         "pass through the output)")
    if p.shape[0] != m - origin * tb:
        raise ValueError("panel rows must match the trailing window")
    interpret = _interpret() if interpret is None else interpret
    nt = m // tb - origin
    i_host, j_host = _lower_pairs(nt)
    npairs = len(i_host)
    nb = p.shape[1]
    if kb is None:
        kb = min(nb, 512)
    if nb % kb:
        raise ValueError(f"panel width {nb} must be a multiple of kb={kb}")
    nk = nb // kb

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(npairs, nk),
        in_specs=[
            pl.BlockSpec((tb, tb), lambda g, k, i, j: (i[g] + origin, j[g] + origin)),
            pl.BlockSpec((tb, kb), lambda g, k, i, j: (i[g], k)),
            pl.BlockSpec((tb, kb), lambda g, k, i, j: (j[g], k)),
        ],
        out_specs=pl.BlockSpec((tb, tb), lambda g, k, i, j: (i[g] + origin, j[g] + origin)),
    )
    flops = 2 * npairs * tb * tb * nb
    kw = {"input_output_aliases": {2: 0}} if alias else {}
    if vmem_limit_bytes is not None or dimension_semantics is not None:
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_bytes,
            dimension_semantics=dimension_semantics,
        )
    return pl.pallas_call(
        _trailing_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(c.shape, c.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=int(c.size * 8 + p.size * 4), transcendentals=0
        ),
        interpret=interpret,
        **kw,
    )(jnp.asarray(i_host), jnp.asarray(j_host), c, p, p)


# ---------------------------------------------------------------------------
# Fused panel-solve application: blocked TRSM over row tiles in one launch
# ---------------------------------------------------------------------------


def _panel_apply_kernel(b_ref, lkk_ref, dinv_ref, out_ref, *, ib: int, nk: int):
    for j in range(nk):  # static unroll: all slicing is constant-offset
        sl = slice(j * ib, (j + 1) * ib)
        acc = b_ref[:, sl].astype(jnp.float32)
        for i in range(j):
            acc = acc - _dot_nt(
                out_ref[:, i * ib : (i + 1) * ib],
                lkk_ref[sl, i * ib : (i + 1) * ib],
            )
        out_ref[:, sl] = _dot_nt(acc, dinv_ref[sl, :]).astype(out_ref.dtype)


def panel_apply(
    lkk: jax.Array,
    b: jax.Array,
    *,
    ib: int = 512,
    tb: int = 1024,
    interpret: bool | None = None,
    vmem_limit_bytes: int | None = 100 * 2**20,
) -> jax.Array:
    """Panel solve X·L^T = B as ONE Pallas launch over row tiles — the
    MXU-resident form of :func:`dla_tpu.algos.potrf._blocktrsm_panel`.

    Per row tile (tb, nb): X_j = (B_j − Σ_{i<j} X_i·L_{j,i}^T)·inv(L_jj)^T
    for the nb/ib diagonal blocks j, with the running X blocks kept in the
    VMEM output ref — the inter-block correction GEMMs never round-trip
    through HBM, and every dot uses the in-kernel 3-pass bf16x3 emission at
    the ``high`` tier (the XLA fallback's HIGH dots measured ~30 TF/s
    end-to-end on this panel shape vs ~63 TF/s for the same math in-kernel,
    ``results_r3/panel1024.jsonl``). The ib×ib diagonal-block inverses are
    computed *outside* (XLA triangular solves against I — tiny, O(nb·ib²))
    and passed in as a (nb, ib) vertical stack.

    Reference analogue: the per-panel TRSM task wave
    (``client_distrib.cpp:526-535``) as a single kernel.

    Constraints: rows of ``b`` must be a multiple of ``tb`` (callers pick
    ``tb`` to divide the trailing height), ``nb % ib == 0``, and the full
    (nb, nb) ``lkk`` block plus the (nb, ib) inverse stack must fit VMEM
    alongside a double-buffered (tb, nb) tile pair — nb ≤ 2048 at fp32.
    Real dtypes only (the Hermitian path stays on the XLA fallback).
    """
    m, nb = b.shape
    if lkk.shape != (nb, nb):
        raise ValueError(f"lkk must be ({nb},{nb}), got {lkk.shape}")
    if nb % ib:
        raise ValueError(f"panel width {nb} must be a multiple of ib={ib}")
    tb = min(tb, m)
    if m % tb:
        raise ValueError(f"panel rows {m} must be a multiple of tb={tb}")
    if jnp.issubdtype(lkk.dtype, jnp.complexfloating):
        raise ValueError("panel_apply is real-only; use the XLA blocktrsm")
    interpret = _interpret() if interpret is None else interpret
    nk = nb // ib
    # diagonal-block inverses, stacked (nb, ib): block j = inv(L_jj)
    eye = jnp.eye(ib, dtype=lkk.dtype)
    dinv = jnp.concatenate(
        [
            lax.linalg.triangular_solve(
                lkk[j * ib : (j + 1) * ib, j * ib : (j + 1) * ib],
                eye, left_side=True, lower=True,
            )
            for j in range(nk)
        ],
        axis=0,
    )
    kw = {}
    if vmem_limit_bytes is not None:
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_bytes,
            dimension_semantics=("arbitrary",),
        )
    return pl.pallas_call(
        functools.partial(_panel_apply_kernel, ib=ib, nk=nk),
        grid=(m // tb,),
        out_shape=jax.ShapeDtypeStruct(b.shape, b.dtype),
        in_specs=[
            pl.BlockSpec((tb, nb), lambda i: (i, 0)),
            pl.BlockSpec((nb, nb), lambda i: (0, 0)),
            pl.BlockSpec((nb, ib), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tb, nb), lambda i: (i, 0)),
        cost_estimate=pl.CostEstimate(
            flops=int(m) * nb * (nb + 2 * ib),
            bytes_accessed=int(2 * b.size * b.dtype.itemsize + lkk.size * lkk.dtype.itemsize),
            transcendentals=0,
        ),
        interpret=interpret,
        **kw,
    )(b, lkk, dinv)


# ---------------------------------------------------------------------------
# Trailing update over PACKED column-slab storage (algos/packed.py layout)
# ---------------------------------------------------------------------------


def _trailing_packed_kernel(ci_ref, cc_ref, pi_ref, pj_ref,
                            c_ref, a_ref, b_ref, out_ref):
    del ci_ref, cc_ref, pi_ref, pj_ref  # consumed by the index maps
    ks = pl.program_id(1)
    upd = _dot_nt(a_ref[:], b_ref[:]).astype(c_ref.dtype)

    @pl.when(ks == 0)
    def _():
        out_ref[:] = c_ref[:] - upd

    @pl.when(ks > 0)
    def _():
        out_ref[:] = out_ref[:] - upd


@functools.lru_cache(maxsize=None)
def _packed_pairs(n: int, w: int, k: int, tb: int):
    """Block-coordinate tables for the trailing tiles of packed step k.

    Global trailing tiles (gi >= gj, both past panel k) are mapped to
    their (row_block, col_block) position inside the 2-D packed
    ``(rows, w)`` buffer: column slab j of the packed triangle starts at
    element row w*(j*ntc - j*(j-1)/2) and holds global rows j*w..n.
    """
    ntc = n // w
    wt = w // tb
    trail0 = (k + 1) * wt  # first trailing tile, global tb units
    ntt = (n - (k + 1) * w) // tb
    ci, cc, pi, pj = [], [], [], []
    for tj in range(ntt):
        for ti in range(tj, ntt):
            g_row, g_col = trail0 + ti, trail0 + tj
            j = g_col // wt  # owning column slab
            roff_blocks = (j * ntc - j * (j - 1) // 2) * wt
            ci.append(roff_blocks + (g_row - j * wt))
            cc.append(g_col % wt)
            pi.append(ti)
            pj.append(tj)
    mk = lambda a: np.asarray(a, np.int32)  # noqa: E731
    return mk(ci), mk(cc), mk(pi), mk(pj)


def trailing_update_packed(
    packed: jax.Array,
    p: jax.Array,
    *,
    n: int,
    w: int,
    k: int,
    tb: int = 1024,
    kb: int | None = None,
    interpret: bool | None = None,
    vmem_limit_bytes: int | None = None,
) -> jax.Array:
    """packed[trailing tiles] ← packed − P·P^T over the column-slab
    packed lower triangle (``dla_tpu.algos.packed`` layout), in place
    (input/output aliased) — the packed analogue of
    :func:`trailing_update_lower`. The XLA per-column update loop reads
    and writes every trailing element twice per panel step
    (slice-copy → GEMM → DUS); this kernel is the single-pass in-place
    version, which matters precisely at the > dense-frontier sizes the
    packed formulation exists for (HBM-bound default/bf16 tiers).

    ``w`` is the packed column-slab width (the formulation's NB);
    ``k`` the current panel index in slab units; ``p`` the solved panel
    of the trailing rows ((n-(k+1)·w, w), storage dtype).
    """
    if n % w or w % tb:
        raise ValueError(f"need n % w == 0 and w % tb == 0 (n={n}, w={w}, tb={tb})")
    if p.shape != (n - (k + 1) * w, w):
        raise ValueError(f"panel shape {p.shape} != {(n - (k + 1) * w, w)}")
    interpret = _interpret() if interpret is None else interpret
    ci, cc, pi, pj = _packed_pairs(n, w, k, tb)
    npairs = len(ci)
    if kb is None:
        kb = min(w, 512)
    if w % kb:
        raise ValueError(f"panel width {w} must be a multiple of kb={kb}")
    nk = w // kb

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(npairs, nk),
        in_specs=[
            pl.BlockSpec((tb, tb), lambda g, ks, ci, cc, pi, pj: (ci[g], cc[g])),
            pl.BlockSpec((tb, kb), lambda g, ks, ci, cc, pi, pj: (pi[g], ks)),
            pl.BlockSpec((tb, kb), lambda g, ks, ci, cc, pi, pj: (pj[g], ks)),
        ],
        out_specs=pl.BlockSpec(
            (tb, tb), lambda g, ks, ci, cc, pi, pj: (ci[g], cc[g])
        ),
    )
    flops = 2 * npairs * tb * tb * w
    kw = {"input_output_aliases": {4: 0}}
    if vmem_limit_bytes is not None:
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_bytes,
        )
    return pl.pallas_call(
        _trailing_packed_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(packed.shape, packed.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=int(npairs * tb * tb * packed.dtype.itemsize * 2
                               + p.size * p.dtype.itemsize),
            transcendentals=0,
        ),
        interpret=interpret,
        **kw,
    )(jnp.asarray(ci), jnp.asarray(cc), jnp.asarray(pi), jnp.asarray(pj),
      packed, p, p)
