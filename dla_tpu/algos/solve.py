"""Solve path: POTRS (triangular solves), POSV, and mixed-precision
iterative refinement.

This is the "full solve + mixed precision" capability from the rebuild's
north star (BASELINE.json config 3): factor in an MXU-friendly precision
(fp32 / bf16), then recover fp64-grade *solution* accuracy by classical
iterative refinement (Wilkinson; cf. PAPERS.md tile-algorithm literature):

    x0 = L^-T L^-1 b          (low precision factor)
    repeat: r = b - A x       (wide precision residual)
            d = L^-T L^-1 r   (low precision correction solve)
            x += d

The refinement loop converges to a backward error at the wide precision's
unit roundoff as long as A is not too ill-conditioned for the factor
precision — giving ≤1e-10 solve residuals from fp32 factors.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from dla_tpu.algos.potrf import potrf_blocked
from dla_tpu.ops import gemm, trsm


def _solve_lower_blocked(l: jax.Array, b: jax.Array, *, trans: bool, ib: int = 512):
    """Left triangular solve L·X=B (or Lᵀ·X=B / Lᴴ·X=B) with only the
    ib×ib diagonal blocks inverted; everything else is MXU GEMMs. XLA's
    native ``triangular_solve`` emits a huge blocked program at large n
    whose remote compile takes tens of minutes on this TPU path — this
    unrolled formulation compiles in seconds and runs at GEMM speed."""
    n = l.shape[-1]
    ib = min(ib, n)
    cj = jnp.iscomplexobj(l)
    # bf16 factors (the N=65536-in-core storage policy) solve in fp32:
    # operand slices upcast block-locally, so no full-matrix f32 copy
    narrow = l.dtype == jnp.bfloat16
    ct = jnp.float32 if narrow else l.dtype
    up = (lambda s: s.astype(ct)) if narrow else (lambda s: s)
    b = b.astype(ct) if b.dtype != ct else b
    eye = jnp.eye(ib, dtype=ct)
    x = jnp.zeros_like(b)
    blocks = list(range(0, n, ib))
    order = blocks if not trans else blocks[::-1]
    for off in order:
        w = min(ib, n - off)
        dinv = trsm(1.0, up(l[off : off + w, off : off + w]), eye[:w, :w],
                    side="L", transa=False)
        rhs = b[off : off + w]
        if not trans and off:
            rhs = gemm(-1.0, up(l[off : off + w, :off]), x[:off], 1.0, rhs)
        elif trans and off + w < n:
            # (op(L))_{ij} = op(L_ji) for j > i in the transposed solve
            rhs = gemm(-1.0, up(l[off + w :, off : off + w]), x[off + w :],
                       1.0, rhs, transa=True, conja=cj)
        x = x.at[off : off + w].set(
            gemm(1.0, dinv, rhs, 0.0, jnp.zeros_like(rhs),
                 transa=trans, conja=trans and cj)
        )
    return x


def potrs(
    l: jax.Array, b: jax.Array, *, blocked: bool | None = None, ib: int = 512
) -> jax.Array:
    """Solve A·X = B given A = L·L^T (L·L^H for c/z): two triangular solves
    (forward then back substitution). Mirrors LAPACK ``dpotrs``; the
    reference ships the factor path only, the solve path is part of the
    rebuild's north star (BASELINE.json).

    ``blocked`` (default: auto, n ≥ 2048) routes through the unrolled
    block-inverse solves instead of XLA's native triangular_solve — see
    :func:`_solve_lower_blocked` for why. ``ib`` is that path's block
    size: the solve is a sequential chain of 2·n/ib block steps, so at
    serving shapes (resident factor, wide RHS blocks) larger ``ib``
    trades diagonal-inverse flops for a shorter dependency chain.
    """
    vec = b.ndim == 1
    bb = b[:, None] if vec else b
    cj = jnp.iscomplexobj(l)
    if blocked is None:
        blocked = l.shape[-1] >= 2048
    if blocked:
        y = _solve_lower_blocked(l, bb, trans=False, ib=ib)
        x = _solve_lower_blocked(l, y, trans=True, ib=ib)
    else:
        ls = l.astype(jnp.float32) if l.dtype == jnp.bfloat16 else l
        bb = bb.astype(ls.dtype) if bb.dtype != ls.dtype else bb
        y = trsm(1.0, ls, bb, side="L", uplo="L", transa=False)
        x = trsm(1.0, ls, y, side="L", uplo="L", transa=True, conja=cj)
    return x[:, 0] if vec else x


def potrs_batched(l: jax.Array, b: jax.Array, **kw) -> jax.Array:
    """Batch of POTRS over leading axes: (..., n, n) resident factors ×
    (..., n, nrhs) RHS blocks, vmapped — the solve half of the batched
    serving workload (:func:`dla_tpu.algos.potri.potrf_batched`). Small
    n routes through XLA's native batched triangular_solve (the
    ``blocked`` auto-threshold applies per matrix)."""
    batch_shape = l.shape[:-2]
    n = l.shape[-1]
    nrhs = b.shape[-1]
    if b.shape[:-2] != batch_shape or b.shape[-2] != n:
        raise ValueError(f"batch/shape mismatch: {l.shape} vs {b.shape}")
    lf = l.reshape((-1, n, n))
    bf = b.reshape((-1, n, nrhs))
    out = jax.vmap(lambda li, bi: potrs(li, bi, **kw))(lf, bf)
    return out.reshape(*batch_shape, n, nrhs)


def posv(a: jax.Array, b: jax.Array, *, nb: int = 256, **kw):
    """Factor + solve (LAPACK ``dposv``). Returns (L, X)."""
    l = potrf_blocked(a, nb=nb, **kw)
    return l, potrs(l, b)


def _symmetrize_lower(a: jax.Array) -> jax.Array:
    return jnp.tril(a) + jnp.tril(a, -1).T


@functools.partial(
    jax.jit,
    static_argnames=("nb", "factor_dtype", "wide_dtype", "iters"),
)
def posv_refined(
    a: jax.Array,
    b: jax.Array,
    *,
    nb: int = 256,
    factor_dtype=jnp.float32,
    wide_dtype=None,
    iters: int = 8,
):
    """Mixed-precision POSV: factor A in ``factor_dtype`` on the MXU, refine
    the solution in ``wide_dtype`` (defaults to f64 under x64, else f32).

    Returns (L_lowprec, X_wide, final_residual_normest).
    """
    if wide_dtype is None:
        wide_dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    aw = _symmetrize_lower(a).astype(wide_dtype)
    bw = b.astype(wide_dtype)
    l = potrf_blocked(aw.astype(factor_dtype), nb=nb)

    def solve_low(r):
        return potrs(l, r.astype(factor_dtype)).astype(wide_dtype)

    x = solve_low(bw)

    def body(_, x):
        r = bw - jnp.matmul(aw, x, preferred_element_type=wide_dtype)
        return x + solve_low(r)

    x = jax.lax.fori_loop(0, iters, body, x)
    r = bw - jnp.matmul(aw, x, preferred_element_type=wide_dtype)
    return l, x, jnp.max(jnp.abs(r))


def posv_refined_host(
    a_host,
    b_host,
    *,
    nb: int = 2048,
    iters: int = 12,
    tol: float = 1e-11,
    potrf_kwargs: dict | None = None,
):
    """Hybrid mixed-precision POSV for devices without trustworthy fp64.

    On this TPU path fp64 arithmetic silently degrades (CLAUDE.md), so the
    all-on-device :func:`posv_refined` cannot reach the reference's 1e-10
    solve contract on-chip. The classical fix is to split the refinement by
    precision *and location*: the O(N³) factor and the O(N²·nrhs)
    correction solves run on the device in fp32 (MXU speed), while the
    O(N²·nrhs) residual ``r = b − A·x`` accumulates on the host in real
    fp64 — per iteration only the nrhs-wide x/r vectors cross the link
    (KBs), never the matrix. This realizes BASELINE.json config 3
    (fp32 factor, ≤1e-10 solve residual) on real TPU hardware.

    Args:
      a_host: (n, n) float64 numpy array, symmetric data in the lower
        triangle (upper ignored).
      b_host: (n,) or (n, nrhs) float64 numpy right-hand side.
      nb / potrf_kwargs: forwarded to the device factorization
        (:func:`~dla_tpu.algos.potrf.potrf_shrink`).
      iters / tol: refinement budget; stops early once the normwise
        backward error ||b − A·x||/(||A||·||x||) drops below tol.

    Returns (x_f64, backward_error_f64, iters_used).
    """
    import numpy as np

    from dla_tpu.algos.potrf import potrf_shrink

    a64 = np.asarray(a_host, np.float64)
    asym = np.tril(a64) + np.tril(a64, -1).T
    vec = np.asarray(b_host).ndim == 1
    b64 = np.asarray(b_host, np.float64).reshape(len(a64), -1)

    l = potrf_shrink(jnp.asarray(asym, jnp.float32), nb=nb, **(potrf_kwargs or {}))
    l.block_until_ready()

    # the factor is a jit ARGUMENT, not a closure capture: capturing bakes
    # the n² factor into the program as a constant that XLA serializes
    # through several host-side copies before compiling (GBs of fresh
    # pages on this balloon-throttled VM — the r3 Phase-B stall)
    solve = jax.jit(potrs)

    norm_a = np.abs(asym).sum(axis=1).max()
    x = np.zeros_like(b64)
    r = b64.copy()
    err = np.inf
    used = 0
    for i in range(iters):
        d = np.asarray(solve(l, jnp.asarray(r, jnp.float32)), np.float64)
        x += d
        r = b64 - asym @ x  # host fp64 — the only trustworthy wide dtype
        used = i + 1
        norm_x = np.abs(x).max()
        err = np.abs(r).max() / (norm_a * max(norm_x, 1e-300))
        if err < tol:
            break
    x = x[:, 0] if vec else x
    return x, float(err), used


def posv_refined_streamed(
    l,
    b_host,
    *,
    seed: int = 51,
    bump: float | None = None,
    panel: int = 4096,
    iters: int = 16,
    tol: float = 1e-11,
    on_iter=None,
    solver=None,
    n: int | None = None,
):
    """:func:`posv_refined_host` for N where the fp64 host matrix cannot be
    materialized (34 GB at N=65536 — beyond this VM's balloon-throttled
    host memory budget, CLAUDE.md): the wide-precision residual
    ``r = b − A·x`` streams A from its seeded plgsy generator
    panel-by-panel through ONE pooled fp64 buffer (native ``dla_plgsy``,
    bit-identical to the device generator), exploiting symmetry so only
    the lower panels are ever generated. Per refinement iteration the host
    does O(N²) fp64 generate+FMA work; the correction solves run on the
    device against the supplied low-precision factor (fp32 or bf16 —
    ``potrs`` upcasts block-locally).

    Args:
      l: device-resident factor of the plgsy(seed, bump) matrix (lower
        triangle meaningful), any storage dtype.
      b_host: (n,) or (n, nrhs) float64 right-hand side.
      solver: optional jitted correction solve ``(r_f32) -> d`` replacing
        the default ``potrs(l, r)`` — e.g. a packed-factor solve
        (``potrs_packed``), whose buffer shape hides n (pass ``n`` too).
      n: matrix dimension when it cannot be read off ``l.shape`` (packed
        factors).

    Returns (x_f64, backward_error_f64, iters_used) — the reference's
    solve gate is err ≤ 1e-10 (``v6_test.c:87`` analogue, BASELINE
    config 3).
    """
    import numpy as np

    from dla_tpu.runtime.staging import _aligned_empty, lib as _native

    if n is None:
        n = l.shape[-1]
    if n % panel:
        raise ValueError(f"n={n} must be a multiple of panel={panel}")
    if bump is None:
        bump = float(n)
    lib = _native()
    gen = lib.dla_plgsy_f64
    work = _aligned_empty(n * panel * 8).view(np.float64)

    vec = np.asarray(b_host).ndim == 1
    b64 = np.asarray(b_host, np.float64).reshape(n, -1)

    def stream_a(apply):
        """apply(k0, a_panel) for each lower panel (rows k0.., cols
        k0..k0+panel) of the fp64 generator output."""
        for k0 in range(0, n, panel):
            h = n - k0
            a = work[: h * panel].reshape(h, panel)
            gen(a.ctypes.data, panel, seed & 0xFFFFFFFF, k0, k0, h, panel,
                bump)
            apply(k0, a)

    # ||A||_inf via streaming row sums (symmetric contributions)
    rowsum = np.zeros(n)

    def _norm(k0, a):
        rowsum[k0:] += np.abs(a).sum(axis=1)
        strict = a[panel:]
        rowsum[k0 : k0 + panel] += np.abs(strict).sum(axis=0)

    stream_a(_norm)
    norm_a = rowsum.max()

    def matvec(x):
        y = np.zeros_like(x)

        def _mv(k0, a):
            y[k0:] += a @ x[k0 : k0 + panel]
            strict = a[panel:]
            y[k0 : k0 + panel] += strict.T @ x[k0 + panel :]

        stream_a(_mv)
        return y

    if solver is None:
        _ps = jax.jit(potrs)  # l as ARGUMENT — see posv_refined_host note
        solver = lambda r32: _ps(l, r32)  # noqa: E731
    x = np.zeros_like(b64)
    r = b64.copy()
    err = np.inf
    used = 0
    for i in range(iters):
        d = np.asarray(solver(jnp.asarray(r, jnp.float32)), np.float64)
        x += d
        r = b64 - matvec(x)  # host fp64, streamed from the generator
        used = i + 1
        err = np.abs(r).max() / (norm_a * max(np.abs(x).max(), 1e-300))
        if on_iter:
            on_iter(i, err)
        if err < tol:
            break
    x = x[:, 0] if vec else x
    return x, float(err), used
