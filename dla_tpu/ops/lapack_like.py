"""LAPACK-like helper routines, TPU-first.

Capability parity targets (reference, cited file:line):

- ``plgsy``        ↔ ``CHAMELEON_dplgsy_Tile(bump, uplo, desc, seed)``
                     (``v6_test.c:46``) — seeded symmetric matrix generation
                     with a diagonal bump. Crucially the generator here is
                     *tile-local deterministic*: any tile of the global matrix
                     can be generated independently from ``(seed, i0, j0)``,
                     which is what lets the distributed / out-of-core paths
                     materialize tiles on their owning device without ever
                     building the full matrix on one host (the reference's
                     client builds the full N×N in RAM —
                     ``client_distrib.cpp:402-405`` — an anti-pattern at
                     scale).
- ``spd_gershgorin`` ↔ client-side SPD recipe ``make_spd_like_chameleon`` +
                     ``enforce_strict_diag_dominance``
                     (``client_distrib.cpp:224-264``).
- ``lange``        ↔ ``CHAMELEON_dlange_Tile`` (``v6_test.c:72,84``).
- ``lacpy``        ↔ ``CHAMELEON_dlacpy_Tile`` (``v6_test.c:49-51``).
- ``lauum``        ↔ ``CHAMELEON_dlauum_Tile`` (``v6_test.c:76-78``).
- ``geadd``        ↔ ``CHAMELEON_dgeadd_Tile`` (``v6_test.c:80-82``).
- ``potrf_unblocked`` ↔ the scalar diagonal-block factor inside the
                     hand-blocked reference (``lapack_dpotrf_remix_c.c:24-36``),
                     vectorized for the VPU (rank-1 trailing updates instead
                     of a scalar j-k loop).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

# ---------------------------------------------------------------------------
# Seeded symmetric generation (plgsy)
# ---------------------------------------------------------------------------

# plain ints, converted at trace time — module-level jnp constants would
# force backend initialization at import, before callers can pick a platform
# (fatal for multi-process jobs that must configure jax.distributed first)
_M1 = 0x85EBCA6B
_M2 = 0xC2B2AE35
_C1 = 0x9E3779B9  # golden-ratio increment (splitmix)
_C2 = 0x7F4A7C15


def _mix32(x: jax.Array) -> jax.Array:
    """murmur3 fmix32 — a full-avalanche uint32 mixer (runs on the VPU)."""
    x = x ^ (x >> 16)
    x = x * jnp.uint32(_M1)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(_M2)
    x = x ^ (x >> 16)
    return x


def _pair_uniform(seed: jax.Array, i: jax.Array, j: jax.Array) -> jax.Array:
    """Deterministic uniform(-0.5, 0.5) value for the *unordered* pair (i, j).

    Using the sorted pair makes the generated matrix exactly symmetric by
    construction, independent of which triangle a tile sits in — the property
    Chameleon's jump-ahead plgsy generator provides and the residual
    validation depends on (SURVEY §4.1).
    """
    lo = jnp.minimum(i, j).astype(jnp.uint32)
    hi = jnp.maximum(i, j).astype(jnp.uint32)
    h = _mix32(hi * jnp.uint32(_C2) ^ seed.astype(jnp.uint32))
    h = _mix32(lo * jnp.uint32(_C1) ^ h)
    # 24 high bits -> float32 uniform in [0, 1): exact in fp32.
    u = (h >> 8).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))
    return u - jnp.float32(0.5)


def plgsy_tile(
    seed,
    i0,
    j0,
    mb: int,
    nb: int,
    *,
    bump: float = 0.0,
    dtype=jnp.float32,
) -> jax.Array:
    """Generate the (mb × nb) tile of the global seeded symmetric matrix whose
    top-left element is global (i0, j0). ``bump`` is added on the global
    diagonal (``dplgsy_Tile(bump=N, ...)`` — ``v6_test.c:46``).

    i0 / j0 may be traced values; mb / nb are static.
    """
    seed = jnp.asarray(seed)
    gi = jnp.asarray(i0, jnp.int32) + jnp.arange(mb, dtype=jnp.int32)
    gj = jnp.asarray(j0, jnp.int32) + jnp.arange(nb, dtype=jnp.int32)
    rows = gi[:, None]
    cols = gj[None, :]
    vals = _pair_uniform(seed, rows, cols).astype(dtype)
    if bump:
        vals = vals + jnp.where(rows == cols, jnp.asarray(bump, dtype), jnp.asarray(0, dtype))
    return vals


@functools.partial(jax.jit, static_argnums=(0,), static_argnames=("bump", "dtype"))
def plgsy(n: int, *, bump: float | None = None, seed: int = 51, dtype=jnp.float32) -> jax.Array:
    """Full n×n seeded symmetric matrix with diagonal bump (default bump=n,
    matching ``dplgsy_Tile((double)N, ChamLower, descA, seed)`` at
    ``v6_test.c:46`` which makes the matrix SPD by diagonal dominance).

    Jitted as one fused elementwise program — eager execution would dispatch
    ~10 separate N² kernels (prohibitive on a remote-TPU path)."""
    if bump is None:
        bump = float(n)
    return plgsy_tile(seed, 0, 0, n, n, bump=bump, dtype=dtype)


def plghe_tile(
    seed,
    i0,
    j0,
    mb: int,
    nb: int,
    *,
    bump: float = 0.0,
    dtype=jnp.complex64,
) -> jax.Array:
    """Hermitian analogue of :func:`plgsy_tile` — the c/z dtype surface of
    the reference's named-args driver (``v3_script_cholesky_x_arg_gpt.c:
    25-33`` maps z/c → ChamComplexDouble/ChamComplexSingle). Real part is
    symmetric-by-pair, imaginary part antisymmetric (zero diagonal), so the
    global matrix is exactly Hermitian and tile-local deterministic."""
    seed = jnp.asarray(seed)
    rdtype = jnp.float64 if jnp.dtype(dtype) == jnp.complex128 else jnp.float32
    gi = jnp.asarray(i0, jnp.int32) + jnp.arange(mb, dtype=jnp.int32)
    gj = jnp.asarray(j0, jnp.int32) + jnp.arange(nb, dtype=jnp.int32)
    rows = gi[:, None]
    cols = gj[None, :]
    re = _pair_uniform(seed, rows, cols).astype(rdtype)
    im = _pair_uniform(seed ^ jnp.uint32(0xA5A5A5A5), rows, cols).astype(rdtype)
    sign = jnp.sign(cols - rows).astype(rdtype)  # antisymmetric, 0 on diag
    if bump:
        re = re + jnp.where(rows == cols, jnp.asarray(bump, rdtype), jnp.asarray(0, rdtype))
    return (re + 1j * (sign * im)).astype(dtype)


@functools.partial(jax.jit, static_argnums=(0,), static_argnames=("bump", "dtype"))
def plghe(n: int, *, bump: float | None = None, seed: int = 51, dtype=jnp.complex64) -> jax.Array:
    """Full n×n seeded Hermitian positive-definite matrix (diagonal bump =
    n by default — HPD by diagonal dominance), ↔ ``CHAMELEON_zplghe_Tile``."""
    if bump is None:
        bump = float(n)
    return plghe_tile(seed, 0, 0, n, n, bump=bump, dtype=dtype)


@functools.partial(
    jax.jit, static_argnums=(0,), static_argnames=("bump", "eps", "dtype")
)
def spd_gershgorin(
    n: int, *, seed: int = 12345, bump: float = 100.0, eps: float = 1e-8, dtype=jnp.float32
) -> jax.Array:
    """SPD generator matching the distributed client's recipe: symmetric
    uniform(-0.5, 0.5), diagonal += bump, then strict diagonal dominance
    enforced row-wise (Gershgorin) — ``client_distrib.cpp:224-264``."""
    a = plgsy_tile(seed, 0, 0, n, n, bump=bump, dtype=dtype)
    offdiag = jnp.sum(jnp.abs(a), axis=1) - jnp.abs(jnp.diagonal(a))
    need = offdiag + jnp.asarray(eps, dtype)
    diag = jnp.diagonal(a)
    newdiag = jnp.maximum(diag, need)
    return a.at[jnp.arange(n), jnp.arange(n)].set(newdiag)


# ---------------------------------------------------------------------------
# Norms / copies / triangular products
# ---------------------------------------------------------------------------


def lange(norm: str, a: jax.Array) -> jax.Array:
    """Matrix norm à la ``dlange``: 'M' (max abs), '1' (max col sum),
    'I' (max row sum), 'F' (Frobenius). Used by the residual contract
    ``||A − LL^T||_inf / ||A||_inf`` (``v6_test.c:72-86``)."""
    norm = norm.upper()
    aa = jnp.abs(a)
    if norm == "M":
        return jnp.max(aa)
    if norm == "1" or norm == "O":
        return jnp.max(jnp.sum(aa, axis=0))
    if norm == "I":
        return jnp.max(jnp.sum(aa, axis=1))
    if norm == "F":
        # sum in f64 where available for a stable norm
        return jnp.sqrt(jnp.sum(jnp.square(a)))
    raise ValueError(f"unknown norm {norm!r}")


def lacpy(uplo: str, a: jax.Array) -> jax.Array:
    """Copy all / lower / upper part of a (``dlacpy``); the complement is
    zero-filled (tile semantics — the reference's validation bug came from
    copying ``ChamUpperLower`` over a lower-only generation, ``v6_test.c:51``;
    SURVEY Appendix A)."""
    u = uplo.upper()
    if u in ("A", "G", "UPPERLOWER"):
        return a
    if u in ("L", "LOWER"):
        return jnp.tril(a)
    if u in ("U", "UPPER"):
        return jnp.triu(a)
    raise ValueError(f"unknown uplo {uplo!r}")


def lauum(uplo: str, a: jax.Array) -> jax.Array:
    """``dlauum`` with LAPACK semantics: lower → L^T·L, upper → U·U^T,
    taking the relevant triangle of ``a``."""
    u = uplo.upper()
    if u in ("L", "LOWER"):
        l = jnp.tril(a)
        return jnp.matmul(l.T, l, preferred_element_type=a.dtype)
    if u in ("U", "UPPER"):
        r = jnp.triu(a)
        return jnp.matmul(r, r.T, preferred_element_type=a.dtype)
    raise ValueError(f"unknown uplo {uplo!r}")


def geadd(alpha, a: jax.Array, beta, b: jax.Array, *, trans: bool = False) -> jax.Array:
    """``dgeadd``: returns alpha·op(A) + beta·B (``v6_test.c:80-82`` uses
    alpha=-1, beta=+1 for the residual subtraction)."""
    op_a = a.T if trans else a
    return jnp.asarray(alpha, a.dtype) * op_a + jnp.asarray(beta, b.dtype) * b


# ---------------------------------------------------------------------------
# Unblocked (in-VMEM) Cholesky and triangular inverse
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=())
def potrf_unblocked(a: jax.Array) -> jax.Array:
    """Unblocked lower Cholesky of one tile via n vectorized rank-1 updates.

    This is the TPU-shaped version of the scalar diagonal-block loop in the
    reference's hand-blocked Cholesky (``lapack_dpotrf_remix_c.c:24-36``):
    instead of a scalar (j, k) recurrence it does one VPU rank-1 trailing
    update per column, which is how the same routine is written inside the
    Pallas tile kernel. Only the lower triangle of the result is meaningful;
    the strict upper triangle is returned as zeros.
    """
    n = a.shape[-1]
    rows = jnp.arange(n)

    def body(j, acc):
        pivot = jnp.sqrt(acc[j, j])
        col = acc[:, j] / pivot
        below = rows > j
        colj = jnp.where(below, col, 0.0)
        newcol = jnp.where(rows == j, pivot, jnp.where(below, col, 0.0))
        acc = acc.at[:, j].set(newcol)
        acc = acc - jnp.outer(colj, colj)
        return acc

    out = lax.fori_loop(0, n, body, a)
    return jnp.tril(out)


def trtri_lower(l: jax.Array) -> jax.Array:
    """Inverse of a lower-triangular tile by forward substitution, one column
    of the identity at a time but vectorized across rows (n fori steps of
    rank-1 work). Used for the MXU-friendly TRSM-as-GEMM trick: on the MXU a
    triangular solve against a B×B tile is better spent as one trtri + many
    GEMMs (the standard tile-algorithm transformation; the reference's
    per-tile ``dtrsm_Tile`` at ``worker_distrib.cpp:323`` becomes
    ``B @ inv(L)^T``)."""
    n = l.shape[-1]
    eye = jnp.eye(n, dtype=l.dtype)
    rows = jnp.arange(n)

    def body(j, x):
        # x holds the partially-computed inv; solve L @ x = I column-block j.
        pivot = l[j, j]
        xrow = x[j, :] / pivot
        x = x.at[j, :].set(xrow)
        colj = jnp.where(rows > j, l[:, j], 0.0)
        x = x - jnp.outer(colj, xrow)
        return x

    return jnp.tril(lax.fori_loop(0, n, body, eye))
