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


def potri(l: jax.Array) -> jax.Array:
    """Inverse of A = L·L^T from its factor: A⁻¹ = L⁻ᵀ·L⁻¹ (full symmetric
    matrix returned). Two blocked triangular solves against the identity,
    then one MXU GEMM."""
    n = l.shape[-1]
    eye = jnp.eye(n, dtype=l.dtype)
    linv = trsm(1.0, l, eye, side="L", uplo="L", transa=False)  # L⁻¹
    return jnp.matmul(
        linv.swapaxes(-1, -2),
        linv,
        preferred_element_type=l.dtype,
        precision=matmul_precision(),
    )


@functools.partial(jax.jit, static_argnames=("nb",))
def potrf_batched(a: jax.Array, *, nb: int = 64) -> jax.Array:
    """Factor a batch of SPD matrices (..., n, n) — vmapped blocked POTRF."""
    batch_shape = a.shape[:-2]
    n = a.shape[-1]
    flat = a.reshape((-1, n, n))
    out = jax.vmap(lambda m: potrf_blocked(m, nb=nb))(flat)
    return out.reshape(*batch_shape, n, n)
