"""BLAS-3 tile ops at the jnp/lax level.

These mirror the four per-tile kernels the reference's task DAG is made of
(``worker_distrib.cpp:238/:323/:416/:511`` — POTRF / TRSM / SYRK / GEMM via
Chameleon) in their exact calling shapes:

- GEMM:  C ← alpha·op(A)·op(B) + beta·C          (reference uses NoTrans,Trans,
         alpha=-1, beta=+1 for the off-diagonal trailing update)
- SYRK:  C ← alpha·A·A^T + beta·C (lower)        (reference: Lower, NoTrans,
         alpha=-1, beta=+1 for the diagonal trailing update)
- TRSM:  B ← alpha·B·inv(op(A)) (Right, Lower, Trans, NonUnit in the
         reference's panel solve)

On TPU these all lower onto the MXU through a single ``dot_general``;
``preferred_element_type`` is always pinned so accumulation precision is
explicit (fp32 accumulation for bf16/fp32 inputs, fp64 under x64).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from dla_tpu.utils.precision import matmul_precision


def _op(a: jax.Array, trans: bool) -> jax.Array:
    return jnp.swapaxes(a, -1, -2) if trans else a


def _acc_dtype(dtype):
    return jnp.float32 if dtype in (jnp.bfloat16, jnp.float16) else dtype


def gemm(alpha, a, b, beta, c, *, transa: bool = False, transb: bool = False,
         conja: bool = False, conjb: bool = False):
    """C ← alpha·op(A)·op(B) + beta·C. Batched over leading dims.
    ``conja``/``conjb`` conjugate the operand (op = conjugate-transpose when
    combined with trans — the Hermitian ``A·Aᴴ`` updates of c/z POTRF)."""
    acc = _acc_dtype(c.dtype)
    opa = _op(a, transa)
    opb = _op(b, transb)
    if conja:
        opa = jnp.conj(opa)
    if conjb:
        opb = jnp.conj(opb)
    prod = jnp.matmul(
        opa,
        opb,
        preferred_element_type=acc,
        precision=matmul_precision(),
    )
    return (jnp.asarray(alpha, acc) * prod + jnp.asarray(beta, acc) * c.astype(acc)).astype(c.dtype)


def syrk(alpha, a, beta, c, *, uplo: str = "L", trans: bool = False):
    """Symmetric rank-k update C ← alpha·op(A)·op(A)^T + beta·C, touching only
    the ``uplo`` triangle of C (the other triangle of the result is passed
    through from C unchanged, matching BLAS dsyrk semantics)."""
    acc = _acc_dtype(c.dtype)
    opa = _op(a, trans)
    prod = jnp.matmul(
        opa,
        jnp.swapaxes(opa, -1, -2),
        preferred_element_type=acc,
        precision=matmul_precision(),
    )
    full = jnp.asarray(alpha, acc) * prod + jnp.asarray(beta, acc) * c.astype(acc)
    full = full.astype(c.dtype)
    if uplo.upper().startswith("L"):
        mask = jnp.tril(jnp.ones(c.shape[-2:], jnp.bool_))
    else:
        mask = jnp.triu(jnp.ones(c.shape[-2:], jnp.bool_))
    return jnp.where(mask, full, c)


def trsm(alpha, a, b, *, side: str = "R", uplo: str = "L", transa: bool = True, unit_diag: bool = False, conja: bool = False):
    """Triangular solve: overwrites B with alpha·B·inv(op(A)) (side='R') or
    alpha·inv(op(A))·B (side='L'). Defaults match the reference's panel solve
    ``dtrsm_Tile(Right, Lower, Trans, NonUnit, 1.0, L, A)``
    (``worker_distrib.cpp:323``).

    Lowers to ``lax.linalg.triangular_solve`` — XLA's native blocked solve.
    """
    left = side.upper().startswith("L")
    lower = uplo.upper().startswith("L")
    x = lax.linalg.triangular_solve(
        a,
        b,
        left_side=left,
        lower=lower,
        transpose_a=transa,
        conjugate_a=conja,
        unit_diagonal=unit_diag,
    )
    if alpha != 1:
        x = jnp.asarray(alpha, x.dtype) * x
    return x
