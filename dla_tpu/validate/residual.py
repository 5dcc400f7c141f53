"""Residual gates and numerical invariants.

The reference's numerical contract (SURVEY §4): every serious driver checks
``||A − L·L^T||_inf / ||A||_inf < 1e-10`` and prints PASS/FAIL
(``v6_test.c:70-87``). Its recorded runs fail that gate because the
generation fills only the lower triangle while the validation takes
full-matrix norms over an uninitialized upper triangle (SURVEY §4.1 /
Appendix A). Here the semantics are fixed: the input A is symmetrized from
its lower triangle before both the subtraction and the denominator norm, so
the gate is actually meetable (and met, in fp64).

``cholesky_invariants`` turns the reference worker's per-task debug
instrumentation (Frobenius norms, NaN/Inf counts, min diagonal, max |upper|,
max asymmetry — ``worker_distrib.cpp:120-148,300-312,389-441,493-530``) into
real checkable assertions for property tests.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dla_tpu.ops import lange

#: The reference's PASS threshold (``v6_test.c:87``).
PASS_THRESHOLD = 1e-10


def _symmetrize_lower(a: jax.Array) -> jax.Array:
    low = jnp.tril(a)
    refl = jnp.tril(a, -1).swapaxes(-1, -2)
    return low + (jnp.conj(refl) if jnp.iscomplexobj(a) else refl)


def residual_potrf(
    a: jax.Array,
    l: jax.Array,
    *,
    norm: str = "I",
    assume_symmetric: bool = False,
    assume_tril: bool = False,
    row_chunk: int | None = None,
) -> jax.Array:
    """Relative factorization residual ``||A − L·L^T||_inf / ||A||_inf``.

    ``a`` may carry garbage in its strict upper triangle (lower-only
    generation); it is symmetrized from the lower triangle unless
    ``assume_symmetric``. ``l`` may carry garbage above the diagonal; only
    ``tril(l)`` is used (``assume_tril`` skips the mask when the caller
    guarantees it). Computation is done in the widest available float
    (f64 under x64) regardless of input dtype so the residual measurement
    itself doesn't limit the gate.

    ``row_chunk``: compute the ∞-norm row-block-wise (a ``fori_loop`` of
    (chunk, n) reconstruction slabs) instead of materializing the full
    N² reconstruction — the HBM-tight validation mode for large N (the
    monolithic form needs an extra N² temporary that at N=32768 fp32 costs
    4 GiB and defeats XLA buffer donation — r2 weak #2). Requires
    ``norm="I"`` and n divisible by ``row_chunk``.
    """
    if jnp.iscomplexobj(a):
        wide = jnp.complex128 if jax.config.jax_enable_x64 else jnp.complex64
    else:
        wide = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    # Half-precision storage + chunked mode: keep the N² operands in storage
    # precision and upcast per-chunk only. bf16×bf16 products are exact in
    # the MXU's wide accumulator (preferred_element_type), so the
    # measurement is as good as the global-upcast path while holding 2-byte
    # N² buffers — the global f32 upcast of A, L and the hoisted Lᵀ costs
    # 3×4 GiB on top of the 2×2 GiB inputs at N=32768 and OOMs a 16 GiB
    # chip (r3: the bf16 campaign/bench validation failure mode).
    low_storage = row_chunk is not None and a.dtype in (
        jnp.bfloat16,
        jnp.float16,
    )
    if low_storage:
        aa = a if assume_symmetric else _symmetrize_lower(a)
        ll = l if assume_tril else jnp.tril(l)
    else:
        aa = a.astype(wide) if assume_symmetric else _symmetrize_lower(a.astype(wide))
        ll = l.astype(wide) if assume_tril else jnp.tril(l).astype(wide)
    if row_chunk is None:
        # precision pinned: the validator's own reconstruction must not run
        # at the TPU's default bf16 matmul precision, or the measurement
        # floor (~1e-3 at large N) masks the factor's actual quality
        rec = jnp.matmul(ll, jnp.conj(ll).swapaxes(-1, -2), preferred_element_type=wide, precision="highest")
        num = lange(norm, aa - rec)
        den = lange(norm, aa)
        return num / den
    n = a.shape[-1]
    if norm.upper() not in ("I", "M"):
        raise ValueError("row_chunk supports norm='I'/'M' only")
    if n % row_chunk:
        raise ValueError(f"n={n} must be a multiple of row_chunk={row_chunk}")
    maxnorm = norm.upper() == "M"
    llt = jnp.conj(ll).swapaxes(-1, -2)

    def body(i, acc):
        num_acc, den_acc = acc
        r0 = i * row_chunk
        arow = jax.lax.dynamic_slice(aa, (r0, 0), (row_chunk, n)).astype(wide)
        lrow = jax.lax.dynamic_slice(ll, (r0, 0), (row_chunk, n))
        rec = jnp.matmul(lrow, llt, preferred_element_type=wide, precision="highest")
        dif = jnp.abs(arow - rec.astype(wide))
        absa = jnp.abs(arow)
        if maxnorm:
            return jnp.maximum(num_acc, dif.max()), jnp.maximum(den_acc, absa.max())
        return (
            jnp.maximum(num_acc, dif.sum(axis=1).max()),
            jnp.maximum(den_acc, absa.sum(axis=1).max()),
        )

    zero = jnp.zeros((), jnp.float64 if wide in (jnp.float64, jnp.complex128) else jnp.float32)
    num, den = jax.lax.fori_loop(0, n // row_chunk, body, (zero, zero))
    return num / den


def residual_posv(a: jax.Array, b: jax.Array, x: jax.Array, *, assume_symmetric: bool = False) -> jax.Array:
    """Relative solve residual ``||B − A·X||_inf / (||A||_inf ||X||_inf)`` —
    the normwise backward error of the solve path (POTRS / POSV)."""
    wide = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    aa = a.astype(wide) if assume_symmetric else _symmetrize_lower(a.astype(wide))
    bb = b.astype(wide)
    xx = x.astype(wide)
    r = bb - jnp.matmul(aa, xx, preferred_element_type=wide, precision="highest")
    num = lange("I", r if r.ndim == 2 else r[:, None])
    den = lange("I", aa) * lange("I", xx if xx.ndim == 2 else xx[:, None])
    return num / den


class CholeskyInvariants(NamedTuple):
    """The worker-v2 debug quantities as a checkable record."""

    nan_count: jax.Array
    inf_count: jax.Array
    diag_min: jax.Array  # min diag(L)  — must be > 0
    upper_maxabs: jax.Array  # max |strict upper(L)| — must be ~0
    fro_norm: jax.Array


def cholesky_invariants(l: jax.Array) -> CholeskyInvariants:
    return CholeskyInvariants(
        nan_count=jnp.sum(jnp.isnan(l)),
        inf_count=jnp.sum(jnp.isinf(l)),
        diag_min=jnp.min(jnp.diagonal(l)),
        upper_maxabs=jnp.max(jnp.abs(jnp.triu(l, 1))) if l.shape[-1] > 1 else jnp.zeros((), l.dtype),
        fro_norm=lange("F", l),
    )


def _mix32_jnp(x):
    x = x.astype(jnp.uint32)
    x = x ^ (x >> jnp.uint32(16))
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> jnp.uint32(13))
    x = x * jnp.uint32(0xC2B2AE35)
    return x ^ (x >> jnp.uint32(16))


def _probe_vec_jnp(n: int, seed: int):
    """The native runtime's Freivalds probe vector (tilestore.cpp probe_x /
    staging._probe_vec), on device: uniform in [-0.5, 0.5)."""
    i = jnp.arange(n, dtype=jnp.uint32)
    h = _mix32_jnp(i * jnp.uint32(0x9E3779B9) ^ jnp.uint32(seed & 0xFFFFFFFF))
    return (h >> jnp.uint32(8)).astype(jnp.float32) * (1.0 / 16777216.0) - 0.5


def freivalds_device(
    l: jax.Array,
    *,
    seed: int = 51,
    bump: float | None = None,
    probes: int = 2,
    row_chunk: int = 4096,
) -> jax.Array:
    """On-device Freivalds residual for factors of seeded plgsy matrices too
    large to reconstruct (or even to hold A in HBM): A is regenerated
    chunk-by-chunk from its seed inside the loop — O(N²) work, peak extra
    memory one (row_chunk, n) fp32 slab.

    Returns ``max_p ||(A − L·Lᵀ)x_p||_inf / (||A||_inf ||x_p||_inf)`` —
    the same contract as the out-of-core ``freivalds_streaming``
    (staging.py), with identical probe vectors, so gates are comparable.
    ``l``'s strict upper triangle is ignored (masked per chunk); bf16
    factors are consumed natively (fp32 accumulation).
    """
    import functools

    n = l.shape[-1]
    if n % row_chunk:
        raise ValueError(f"n={n} must be a multiple of row_chunk={row_chunk}")
    if bump is None:
        bump = float(n)
    from dla_tpu.ops.lapack_like import plgsy_tile

    x = jnp.stack(
        [_probe_vec_jnp(n, 0xC0FFEE ^ p) for p in range(probes)], axis=1
    )  # (n, probes) f32
    xinf = jnp.abs(x).max(axis=0)
    nchunks = n // row_chunk
    cols = jnp.arange(n)
    mm = functools.partial(
        jnp.matmul, preferred_element_type=jnp.float32, precision="highest"
    )

    def ltri(r0):
        """tril-masked fp32 rows [r0, r0+row_chunk) of l."""
        lrow = jax.lax.dynamic_slice(
            l, (r0, jnp.zeros_like(r0)), (row_chunk, n)
        ).astype(jnp.float32)
        rows = r0 + jnp.arange(row_chunk)
        return jnp.where(cols[None, :] <= rows[:, None], lrow, 0.0)

    # pass 1: u = Lᵀ x  (accumulated over row chunks)
    def body_u(i, u):
        r0 = i * row_chunk
        lr = ltri(r0)
        xr = jax.lax.dynamic_slice(x, (r0, 0), (row_chunk, x.shape[1]))
        return u + mm(lr.T, xr)

    u = jax.lax.fori_loop(0, nchunks, body_u, jnp.zeros_like(x))

    # pass 2: per chunk, r_rows = A_rows·x − L_rows·u ; track ||·||_inf and
    # the streaming ||A||_inf row sums
    def body_r(i, acc):
        num, na = acc
        r0 = i * row_chunk
        a_rows = plgsy_tile(seed, r0, 0, row_chunk, n, bump=bump,
                            dtype=jnp.float32)
        y = mm(a_rows, x)
        z = mm(ltri(r0), u)
        num = jnp.maximum(num, jnp.abs(y - z).max(axis=0))
        na = jnp.maximum(na, jnp.abs(a_rows).sum(axis=1).max())
        return num, na

    num, norm_a = jax.lax.fori_loop(
        0, nchunks, body_r,
        (jnp.zeros_like(xinf), jnp.zeros((), jnp.float32)),
    )
    return (num / xinf).max() / norm_a
