"""Fused Pallas trailing update for the emulated-fp64 (df64) POTRF.

The XLA df64 trailing path (ops/df64.df64_matmul_nt) measured ~2.9 TF/s
logical = 33% of the 8.7 TF/s pass bound (182/21) on chip: every one of
the S(S+1)/2 bf16 pass partials round-trips HBM and the compensated adds
run as separate fused loops. This kernel runs the WHOLE pass loop per
C tile inside VMEM:

- grid over the lower-triangle tile pairs only (same scalar-prefetched
  (i, j) lists as ``trailing_update_lower`` — triangle-aware, so it also
  replaces the XLA path's strip approximation);
- per tile: S² /2 bf16 MXU dots of the pre-sliced panel (slices computed
  once per panel by ``ops.df64.slice_rows`` — exact by construction),
  compensated into a (hi, lo) accumulator with in-register two_sum for
  the high-significance pairs (i+j ≤ precise_deg) and plain lo-adds for
  the rest; ONE load/store of the C pair per k-chunk;
- k-chunks of ``kb = 2^(26−2w)`` (1024 at w=8) keep every accumulation
  within a pass exact — at the potrf's nb=1024 panels there is exactly
  one chunk, so each C element is touched once per panel step.

Inputs are the (hi, lo) C pair (input/output aliased, updated in place
over a full (m, m) buffer from tile ``origin`` — the in-place
formulation ``potrf_df64`` uses) and the S slice matrices, each passed
twice (Pi role indexed by i[g], Pj role by j[g]).

Runs in interpret mode off-TPU (tests gate it against the XLA df64 GEMM
bit-for-bit at matching pass structure and against true fp64).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dla_tpu.kernels.pallas_tiles import _lower_pairs
from dla_tpu.ops.df64 import max_exact_chunk, quick_two_sum, two_sum

_F32 = jnp.float32


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _df64_accum_body(ch_ref, cl_ref, refs, *, s: int, precise_deg: int,
                     nk: int):
    """Shared kernel body: C(hi,lo) ← C − P·Pᵀ pass loop, compensated
    in-register (used by the dense and packed trailing wrappers, which
    differ only in their scalar-prefetched index maps)."""
    # refs = s Pi slice refs + s Pj slice refs + (och_ref, ocl_ref)
    pi = refs[:s]
    pj = refs[s:2 * s]
    och, ocl = refs[2 * s], refs[2 * s + 1]
    ks = pl.program_id(1)

    @pl.when(ks == 0)
    def _():
        och[:] = ch_ref[:]
        ocl[:] = cl_ref[:]

    ah = och[:]
    al = ocl[:]
    dims = (((1,), (1,)), ((), ()))
    for i in range(s):
        for j in range(s - i):
            p = lax.dot_general(
                pi[i][:], pj[j][:], dims,
                preferred_element_type=_F32,
                precision=lax.Precision.DEFAULT,
            )
            if i + j <= precise_deg:
                ah, e = two_sum(ah, -p)
                al = al + e
            else:
                al = al - p

    @pl.when(ks == nk - 1)
    def _():
        h, l = quick_two_sum(ah, al)
        och[:] = h
        ocl[:] = l

    @pl.when(ks < nk - 1)
    def _():
        och[:] = ah
        ocl[:] = al


def _df64_trailing_kernel(i_ref, j_ref, ch_ref, cl_ref, *refs,
                          s: int, precise_deg: int, nk: int):
    del i_ref, j_ref  # consumed by the index maps
    _df64_accum_body(ch_ref, cl_ref, refs, s=s, precise_deg=precise_deg,
                     nk=nk)


def _df64_trailing_packed_kernel(ci_ref, cc_ref, pi_ref, pj_ref,
                                 ch_ref, cl_ref, *refs,
                                 s: int, precise_deg: int, nk: int):
    del ci_ref, cc_ref, pi_ref, pj_ref  # consumed by the index maps
    _df64_accum_body(ch_ref, cl_ref, refs, s=s, precise_deg=precise_deg,
                     nk=nk)


def trailing_update_df64(
    ch: jax.Array,
    cl: jax.Array,
    slices: list[jax.Array],
    *,
    origin: int = 0,
    tb: int = 512,
    w: int = 8,
    precise_deg: int = 3,
    interpret: bool | None = None,
    vmem_limit_bytes: int | None = 100 * 2**20,
) -> tuple[jax.Array, jax.Array]:
    """C(hi,lo)[lower trailing tiles] ← C − P·Pᵀ where P is given as its
    ``s`` exact bf16 slices (``ops.df64.slice_rows``). Updates the
    trailing submatrix starting at tile (origin, origin) of the full
    (m, m) pair IN PLACE (both planes aliased); visits lower-triangle
    tile pairs only. Slice rows must equal m − origin·tb."""
    m, m2 = ch.shape
    if m != m2 or cl.shape != ch.shape:
        raise ValueError("C pair must be square and matching")
    if m % tb:
        raise ValueError(f"m={m} must be a multiple of tb={tb}")
    s = len(slices)
    h, nb = slices[0].shape
    if h != m - origin * tb:
        raise ValueError(f"slice rows {h} != trailing window {m - origin * tb}")
    kb = min(nb, max_exact_chunk(w))
    if nb % kb:
        raise ValueError(f"panel width {nb} not a multiple of chunk {kb}")
    nk = nb // kb
    interpret = _interpret() if interpret is None else interpret
    nt = m // tb - origin
    i_host, j_host = _lower_pairs(nt)
    npairs = len(i_host)

    def cmap(g, k, i, j):
        return (i[g] + origin, j[g] + origin)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(npairs, nk),
        in_specs=(
            [pl.BlockSpec((tb, tb), cmap)] * 2
            + [pl.BlockSpec((tb, kb), lambda g, k, i, j: (i[g], k))] * s
            + [pl.BlockSpec((tb, kb), lambda g, k, i, j: (j[g], k))] * s
        ),
        out_specs=(
            pl.BlockSpec((tb, tb), cmap),
            pl.BlockSpec((tb, tb), cmap),
        ),
    )
    flops = 2 * npairs * tb * tb * nb * (s * (s + 1) // 2)
    kw = {"input_output_aliases": {2: 0, 3: 1}}
    if vmem_limit_bytes is not None:
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_bytes)
    return pl.pallas_call(
        functools.partial(
            _df64_trailing_kernel, s=s, precise_deg=precise_deg, nk=nk),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct(ch.shape, _F32),
            jax.ShapeDtypeStruct(cl.shape, _F32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=int(npairs * tb * tb * 16
                               + 2 * s * h * nb * 2),
            transcendentals=0,
        ),
        interpret=interpret,
        **kw,
    )(jnp.asarray(i_host), jnp.asarray(j_host), ch, cl, *slices, *slices)


def trailing_update_packed_df64(
    ph: jax.Array,
    pl_: jax.Array,
    slices: list[jax.Array],
    *,
    n: int,
    nb: int,
    k: int,
    tb: int = 512,
    w: int = 8,
    precise_deg: int = 3,
    interpret: bool | None = None,
    vmem_limit_bytes: int | None = 100 * 2**20,
) -> tuple[jax.Array, jax.Array]:
    """df64 trailing update over the **column-slab packed** lower
    triangle (``dla_tpu.algos.packed`` layout): packed(hi,lo)[trailing
    tiles] ← packed − P·Pᵀ with P given as its ``s`` exact bf16 slices.
    Same pass-loop body as :func:`trailing_update_df64`; only the
    scalar-prefetched index maps differ (``_packed_pairs`` block
    coordinates into the 2-D ``(rows, nb)`` packed pair). In place over
    both planes (input/output aliased). ``nb`` is the packed slab width
    (the formulation's panel), ``k`` the current slab index, ``tb`` the
    kernel tile (``tb | nb``). The slices span the trailing rows
    (n − (k+1)·nb, nb)."""
    from dla_tpu.kernels.pallas_tiles import _packed_pairs

    if pl_.shape != ph.shape:
        raise ValueError("packed pair planes must match")
    if n % nb or nb % tb:
        raise ValueError(f"need tb | nb | n (n={n}, nb={nb}, tb={tb})")
    s = len(slices)
    h, pw = slices[0].shape
    if h != n - (k + 1) * nb or pw != nb:
        raise ValueError(
            f"slice shape {(h, pw)} != {(n - (k + 1) * nb, nb)}")
    kb = min(nb, max_exact_chunk(w))
    if nb % kb:
        raise ValueError(f"panel width {nb} not a multiple of chunk {kb}")
    nk = nb // kb
    interpret = _interpret() if interpret is None else interpret
    ci, cc, pi, pj = _packed_pairs(n, nb, k, tb)
    npairs = len(ci)

    def cmap(g, ks, ci, cc, pi, pj):
        return (ci[g], cc[g])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(npairs, nk),
        in_specs=(
            [pl.BlockSpec((tb, tb), cmap)] * 2
            + [pl.BlockSpec((tb, kb),
                            lambda g, ks, ci, cc, pi, pj: (pi[g], ks))] * s
            + [pl.BlockSpec((tb, kb),
                            lambda g, ks, ci, cc, pi, pj: (pj[g], ks))] * s
        ),
        out_specs=(
            pl.BlockSpec((tb, tb), cmap),
            pl.BlockSpec((tb, tb), cmap),
        ),
    )
    flops = 2 * npairs * tb * tb * nb * (s * (s + 1) // 2)
    kw = {"input_output_aliases": {4: 0, 5: 1}}
    if vmem_limit_bytes is not None:
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_bytes)
    return pl.pallas_call(
        functools.partial(
            _df64_trailing_packed_kernel, s=s, precise_deg=precise_deg,
            nk=nk),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct(ph.shape, _F32),
            jax.ShapeDtypeStruct(pl_.shape, _F32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=int(npairs * tb * tb * 16 + 2 * s * h * nb * 2),
            transcendentals=0,
        ),
        interpret=interpret,
        **kw,
    )(jnp.asarray(ci), jnp.asarray(cc), jnp.asarray(pi), jnp.asarray(pj),
      ph, pl_, *slices, *slices)
