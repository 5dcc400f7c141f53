"""POTRI / batched POTRF — completing the factor-adjacent toolset.

``potri`` computes A⁻¹ from the Cholesky factor (LAPACK dpotri semantics:
A⁻¹ = L⁻ᵀ·L⁻¹), the missing piece between the reference's ``dpotrf`` and its
validation-only ``dlauum`` usage (``v6_test.c:76-78``): here lauum-of-inverse
is the *useful* composition. ``potrf_batched`` vmaps the blocked
factorization over a leading batch axis — many small SPD factorizations in
one MXU-batched program (a serving-shaped workload the reference's
one-matrix-per-process drivers cannot express).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from dla_tpu.algos.potrf import potrf_blocked
from dla_tpu.ops import trsm
from dla_tpu.utils.precision import matmul_precision


def potri(
    l: jax.Array, *, blocked: bool | None = None, ib: int = 1024
) -> jax.Array:
    """Inverse of A = L·L^T from its factor: A⁻¹ = L⁻ᵀ·L⁻¹ (full symmetric
    matrix returned). One triangular solve against the identity, then one
    MXU GEMM (L⁻ᵀ·L⁻¹ — the lauum-of-inverse composition).

    ``blocked`` (default: auto, n ≥ 2048) computes L⁻¹ with the unrolled
    block-inverse solve from :mod:`dla_tpu.algos.solve` instead of XLA's
    native ``triangular_solve``, whose emitted program is remote-compile-
    hostile at large n (same reason as :func:`~dla_tpu.algos.solve.potrs`).
    This is the serving fast path's one-time cost: with A⁻¹ resident,
    answering an (n, nrhs) RHS block is a single full-rate MXU GEMM
    instead of a 2·n/ib-step sequential solve chain — see
    :func:`solve_inverse`. Forward error is ~κ(A)·eps (vs the solve's
    backward-stable path); gate accordingly or refine against the factor.
    """
    from dla_tpu.algos.solve import _solve_lower_blocked

    n = l.shape[-1]
    eye = jnp.eye(n, dtype=l.dtype)
    if blocked is None:
        blocked = n >= 2048
    if blocked:
        linv = _solve_lower_blocked(l, eye, trans=False, ib=ib)
    else:
        linv = trsm(1.0, l, eye, side="L", uplo="L", transa=False)  # L⁻¹
    cj = jnp.iscomplexobj(l)
    lh = jnp.conj(linv.swapaxes(-1, -2)) if cj else linv.swapaxes(-1, -2)
    return jnp.matmul(
        lh,
        linv,
        preferred_element_type=linv.dtype,
        precision=matmul_precision(),
    )


def solve_inverse(ainv: jax.Array, b: jax.Array) -> jax.Array:
    """Serving fast path: X = A⁻¹·B as one MXU GEMM from a resident
    :func:`potri` inverse. Same 2·N²·NRHS useful flops as ``potrs`` but
    executed at GEMM rate instead of a sequential block-solve chain —
    the classic precompute-the-inverse serving trade (O(N³) once,
    full-MXU-rate per query; forward error ~κ(A)·eps)."""
    vec = b.ndim == 1
    bb = b[:, None] if vec else b
    x = jnp.matmul(
        ainv,
        bb.astype(ainv.dtype),
        preferred_element_type=ainv.dtype,
        precision=matmul_precision(),
    )
    return x[:, 0] if vec else x


@functools.partial(jax.jit, static_argnames=("nb",))
def potrf_batched(a: jax.Array, *, nb: int = 64) -> jax.Array:
    """Factor a batch of SPD matrices (..., n, n) — vmapped blocked POTRF."""
    batch_shape = a.shape[:-2]
    n = a.shape[-1]
    flat = a.reshape((-1, n, n))
    out = jax.vmap(lambda m: potrf_blocked(m, nb=nb))(flat)
    return out.reshape(*batch_shape, n, n)
