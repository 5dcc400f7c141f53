"""Packed (triangle-only) column-cyclic distributed POTRF on a flat mesh.

Combines the two r3 memory formulations: the single-chip packed layout
(``algos/packed.py`` — resident ≈ n²/2, the LAPACK ``dpptrf`` family)
and the flat-mesh column-cyclic distribution with the Pallas RDMA ring
data plane (``parallel/column_cyclic.py``; tile-column ownership by
index exactly as the reference's ArmoniK DAG distributes tiles,
``client_distrib.cpp:506-565``). Per-device resident memory is
≈ n²/(2·D) — the dense column-cyclic path holds full columns at n²/D —
so a mesh of D chips holds a √2× larger in-core N *on top of* the
packed single-chip gain.

Layout (all shapes static under ``shard_map``): device d owns global
tile columns gcol = lj·D + d (lj = 0..ltc−1). Its local buffer stacks
one slab per lj, each padded to the lj-envelope height
``hs(lj) = (nt − lj·D)·nb`` — the owner-0 height — so slab offsets and
sizes are device-independent Python constants. Real data sits at the
top of each slab (buffer row 0 of slab lj = global row gcol·nb); the
bottom d·nb padding rows start as zeros and stay zero (the broadcast
panel is zero-padded, see below), wasting only ≈ n·nb·(D−1)/2 elements
mesh-wide.

Per step k (trace-time unrolled, right-looking):

1. the owner (kc = k mod D) factors its slab's top nb×nb block and
   TRSM-solves the rows below — *static* slices, because the owner's
   slab top IS the global diagonal block;
2. the factor tile and the solved panel ride the Pallas ring
   (``ring_broadcast``) to the other D−1 devices; the panel is then
   zero-padded to ``(nt−k−1 + D−1)·nb`` rows so that every receiver's
   traced ``dynamic_slice`` (offset ``(gcol−k−1)·nb``, static size
   ``hs(lj)``) is in bounds without clamping;
3. every device updates each owned trailing slab in full (slab rows
   start at the slab's own diagonal, so there is no above-diagonal
   garbage to mask — only the per-slab ``gcol > k`` ownership mask).

Numerics match the 1e-10 fp64 gate of every other factorization path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dla_tpu.kernels.collectives import ring_broadcast


def _geometry(n: int, nb: int, ndev: int):
    """(nt, ltc, static slab heights, static slab offsets, local rows)."""
    nt = n // nb
    ltc = nt // ndev
    hs = [(nt - lj * ndev) * nb for lj in range(ltc)]
    off = np.concatenate([[0], np.cumsum(hs)]).astype(int)
    return nt, ltc, hs, off


def pack_cols_packed(a: np.ndarray, nb: int, mesh: Mesh) -> jax.Array:
    """Shard a dense (n, n) SPD matrix's lower triangle column-cyclically
    in packed form: returns a ``(D·R, nb)`` array sharded ``P('d', None)``
    where each device's ``(R, nb)`` shard stacks its owned tile columns'
    below-diagonal rows (zero-padded to the lj-envelope heights)."""
    n = a.shape[0]
    ndev = mesh.size
    nt, ltc, hs, off = _geometry(n, nb, ndev)
    shards = []
    for d in range(ndev):
        rows = []
        for lj in range(ltc):
            gcol = lj * ndev + d
            blk = np.asarray(
                a[gcol * nb :, gcol * nb : (gcol + 1) * nb])
            pad = hs[lj] - blk.shape[0]
            rows.append(np.pad(blk, ((0, pad), (0, 0))))
        shards.append(np.concatenate(rows, axis=0))
    full = np.concatenate(shards, axis=0)
    return jax.device_put(full, NamedSharding(mesh, P("d", None)))


def unpack_cols_packed(x, n: int, nb: int, mesh: Mesh) -> np.ndarray:
    """Inverse of :func:`pack_cols_packed` → dense lower triangle."""
    ndev = mesh.size
    nt, ltc, hs, off = _geometry(n, nb, ndev)
    xh = np.asarray(x)
    r = off[-1]
    out = np.zeros((n, n), xh.dtype)
    for d in range(ndev):
        loc = xh[d * r : (d + 1) * r]
        for lj in range(ltc):
            gcol = lj * ndev + d
            h = (nt - gcol) * nb
            out[gcol * nb :, gcol * nb : (gcol + 1) * nb] = (
                loc[off[lj] : off[lj] + h])
    return np.tril(out)


def _potrf_local_packed(x, *, nb: int, nt: int, ndev: int,
                        interpret: bool | None):
    """Per-device SPMD program (runs under shard_map on the flat mesh)."""
    ltc = nt // ndev
    _, _, hs, off = _geometry(nt * nb, nb, ndev)
    c = lax.axis_index("d")
    dtype = x.dtype
    zero = jnp.zeros((), dtype)

    for k in range(nt):
        kc, ljk = k % ndev, k // ndev
        own = c == kc

        # -- panel solve on the owner: STATIC slices (the owner slab's
        # top block IS the global diagonal block) ------------------------
        dblk = x[off[ljk] : off[ljk] + nb]
        colw = x[off[ljk] + nb : off[ljk] + hs[ljk]]

        def _solve(args):
            d, col = args
            lkk = jnp.tril(lax.linalg.cholesky(d, symmetrize_input=False))
            if col.shape[0]:
                col = lax.linalg.triangular_solve(
                    lkk, col, left_side=False, lower=True, transpose_a=True
                )
            return lkk, col

        def _skip(args):
            d, col = args
            return jnp.zeros_like(d), jnp.zeros_like(col)

        lkk, solved = lax.cond(own, _solve, _skip, (dblk, colw))

        # -- ring data plane: factor tile + solved panel -------------------
        lkk = ring_broadcast(lkk, "d", kc, collective_id=0,
                             interpret=interpret)
        x = x.at[off[ljk] : off[ljk] + nb].set(
            jnp.where(own, lkk, dblk))
        if k == nt - 1:
            break
        panel = ring_broadcast(solved, "d", kc, collective_id=1,
                               interpret=interpret)
        x = x.at[off[ljk] + nb : off[ljk] + hs[ljk]].set(
            jnp.where(own, panel, colw))
        # zero-pad so every receiver's traced slice below is in bounds
        # (the owner slab's own zero padding covers kc·nb of these rows;
        # max needed = (nt-k-1 + D-1)·nb)
        pad = (ndev - 1 - kc) * nb
        if pad:
            panel = jnp.concatenate(
                [panel, jnp.zeros((pad, nb), dtype)], axis=0)

        # -- trailing update: full owned slabs right of k -------------------
        for lj in range(ltc):
            if lj * ndev + ndev - 1 <= k:
                continue  # no device's gcol at this lj is right of k
            gcol = lj * ndev + c  # traced
            live = gcol > k
            op = jnp.maximum((gcol - k - 1) * nb, 0)
            b = lax.dynamic_slice(panel, (op, jnp.zeros_like(op)), (nb, nb))
            a_rows = lax.dynamic_slice(
                panel, (op, jnp.zeros_like(op)), (hs[lj], nb))
            upd = jnp.matmul(
                a_rows, b.T,
                preferred_element_type=(
                    jnp.float32 if dtype in (jnp.bfloat16, jnp.float16)
                    else dtype),
            ).astype(dtype)
            upd = jnp.where(live, upd, zero)
            x = x.at[off[lj] : off[lj] + hs[lj]].add(-upd)
    return x


@functools.partial(
    jax.jit, static_argnames=("n", "nb", "mesh", "interpret"))
def _potrf_jit_n(x, n: int, nb: int, mesh: Mesh, interpret: bool | None):
    nt = n // nb
    local = functools.partial(
        _potrf_local_packed, nb=nb, nt=nt, ndev=mesh.size,
        interpret=interpret,
    )
    return jax.shard_map(
        local, mesh=mesh, in_specs=P("d", None), out_specs=P("d", None),
        check_vma=False,
    )(x)


def potrf_packed_cyclic(
    x: jax.Array,
    n: int,
    nb: int,
    mesh: Mesh,
    *,
    interpret: bool | None = None,
) -> jax.Array:
    """Distributed POTRF of a packed column-cyclic sharded triangle (see
    :func:`pack_cols_packed`) with ring-RDMA panel broadcasts. Requires
    nt = n/nb to be a multiple of the flat mesh size. Returns the factor
    in the same packed layout."""
    if n % nb:
        raise ValueError(f"n={n} must be a multiple of nb={nb}")
    nt = n // nb
    if nt % mesh.size:
        raise ValueError(
            f"nt={nt} tile columns must be a multiple of mesh size "
            f"{mesh.size}")
    if len(mesh.axis_names) != 1:
        raise ValueError(
            "potrf_packed_cyclic needs a flat 1-D mesh (Pallas remote "
            "DMA cannot address multi-axis meshes)")
    _, _, _, off = _geometry(n, nb, mesh.size)
    if x.shape != (off[-1] * mesh.size, nb):
        raise ValueError(
            f"packed buffer shape {x.shape} != {(off[-1] * mesh.size, nb)}"
            " — build it with pack_cols_packed")
    return _potrf_jit_n(x, n, nb, mesh, interpret)


# ---------------------------------------------------------------------------
# r5: distributed df64 — the reference's fp64 contract ON the mesh.
# The reference's only distributed workload factors *fp64* tiles: every
# ArmoniK worker kernel is CHAMELEON_dpotrf_Tile/dtrsm/dgemm on double[B*B]
# blobs (worker_distrib.cpp:238,212-213) driven by the fp64 wave DAG
# (client_distrib.cpp:506-565). This plane runs the rebuild's emulated-fp64
# arithmetic (ops/df64, ~49 mantissa bits, 1e-10-gate-capable) under the
# same packed column-cyclic layout + Pallas ring data plane as the fp32
# plane above — per-device resident ≈ 2·(n²/2D) fp32 words (the df64 pair).
# ---------------------------------------------------------------------------


def _potrf_local_packed_df64(xh, xl, *, nb: int, nt: int, ndev: int,
                             s: int, w: int, precise_deg: int, refine: int,
                             slice_reuse: bool,
                             interpret: bool | None):
    """Per-device SPMD df64 program (under shard_map on the flat mesh).

    Identical schedule to :func:`_potrf_local_packed`; every arithmetic
    step is double-word: the owner factors its diagonal block with the
    refined df64 Cholesky and df64-TRSMs the rows below
    (``algos/potrf_df64._factor_diag_df64`` / ``_panel_solve_df64``), the
    (hi, lo) planes ride the ring stacked into ONE buffer per broadcast
    (same hop count as fp32 — 2 broadcasts/step — at 2× the bytes), and
    each receiver slices the panel's bf16 slice set ONCE per step (slices
    are per-row scaled, so row sub-ranges are valid slice sets) before
    the per-slab exact-sliced MXU trailing GEMMs with compensated
    accumulation into the slab pair."""
    from dla_tpu.algos.potrf_df64 import (
        _factor_diag_df64,
        _panel_solve_df64,
    )
    from dla_tpu.ops.df64 import df_sub, df64_matmul_nt, slice_rows

    ltc = nt // ndev
    _, _, hs, off = _geometry(nt * nb, nb, ndev)
    c = lax.axis_index("d")
    gemm_kw = dict(s=s, w=w, precise_deg=precise_deg)

    for k in range(nt):
        kc, ljk = k % ndev, k // ndev
        own = c == kc

        dblk_h = xh[off[ljk]: off[ljk] + nb]
        dblk_l = xl[off[ljk]: off[ljk] + nb]
        colw_h = xh[off[ljk] + nb: off[ljk] + hs[ljk]]
        colw_l = xl[off[ljk] + nb: off[ljk] + hs[ljk]]

        def _solve(args):
            dh, dl, ch_, cl_ = args
            lkk_h, lkk_l = _factor_diag_df64(
                dh, dl, refine=refine, gemm_kw=gemm_kw)
            if ch_.shape[0]:
                ch_, cl_ = _panel_solve_df64(
                    lkk_h, lkk_l, ch_, cl_, refine=refine, gemm_kw=gemm_kw)
            return lkk_h, lkk_l, ch_, cl_

        def _skip(args):
            dh, dl, ch_, cl_ = args
            return (jnp.zeros_like(dh), jnp.zeros_like(dl),
                    jnp.zeros_like(ch_), jnp.zeros_like(cl_))

        lkk_h, lkk_l, sol_h, sol_l = lax.cond(
            own, _solve, _skip, (dblk_h, dblk_l, colw_h, colw_l))

        # -- ring data plane: both planes stacked into one buffer/hop ----
        dpair = ring_broadcast(
            jnp.concatenate([lkk_h, lkk_l], axis=0), "d", kc,
            collective_id=0, interpret=interpret)
        lkk_h, lkk_l = dpair[:nb], dpair[nb:]
        xh = xh.at[off[ljk]: off[ljk] + nb].set(
            jnp.where(own, lkk_h, dblk_h))
        xl = xl.at[off[ljk]: off[ljk] + nb].set(
            jnp.where(own, lkk_l, dblk_l))
        if k == nt - 1:
            break
        ph = hs[ljk] - nb  # panel rows this step
        ppair = ring_broadcast(
            jnp.concatenate([sol_h, sol_l], axis=0), "d", kc,
            collective_id=1, interpret=interpret)
        pan_h, pan_l = ppair[:ph], ppair[ph:]
        xh = xh.at[off[ljk] + nb: off[ljk] + hs[ljk]].set(
            jnp.where(own, pan_h, colw_h))
        xl = xl.at[off[ljk] + nb: off[ljk] + hs[ljk]].set(
            jnp.where(own, pan_l, colw_l))
        # zero-pad for in-bounds traced slices (see fp32 plane)
        pad = (ndev - 1 - kc) * nb
        if pad:
            z = jnp.zeros((pad, nb), xh.dtype)
            pan_h = jnp.concatenate([pan_h, z], axis=0)
            pan_l = jnp.concatenate([pan_l, z], axis=0)
        # slice the received panel ONCE per step; per-slab row sub-ranges
        # of the slice set are themselves valid slice sets
        # (slice_reuse=False: re-slice per slab from the (hi, lo) planes
        # instead — the r5 on-chip isolation lever)
        sx = (slice_rows(pan_h, pan_l, s=s, w=w)[0]
              if slice_reuse else None)

        # -- df64 trailing update over owned slabs right of k ------------
        for lj in range(ltc):
            if lj * ndev + ndev - 1 <= k:
                continue
            gcol = lj * ndev + c  # traced
            live = gcol > k
            op = jnp.maximum((gcol - k - 1) * nb, 0)
            z0 = jnp.zeros_like(op)
            if slice_reuse:
                sa = [lax.dynamic_slice(sl, (op, z0), (hs[lj], nb))
                      for sl in sx]
                sb = [lax.dynamic_slice(sl, (op, z0), (nb, nb))
                      for sl in sx]
                uh, ul = df64_matmul_nt(
                    None, None, None, None, slices_a=sa, slices_b=sb,
                    **gemm_kw)
            else:
                arh = lax.dynamic_slice(pan_h, (op, z0), (hs[lj], nb))
                arl = lax.dynamic_slice(pan_l, (op, z0), (hs[lj], nb))
                bh_ = lax.dynamic_slice(pan_h, (op, z0), (nb, nb))
                bl_ = lax.dynamic_slice(pan_l, (op, z0), (nb, nb))
                uh, ul = df64_matmul_nt(arh, arl, bh_, bl_, **gemm_kw)
            slab_h = lax.dynamic_slice(
                xh, (off[lj], 0), (hs[lj], nb))
            slab_l = lax.dynamic_slice(
                xl, (off[lj], 0), (hs[lj], nb))
            nh, nl = df_sub(slab_h, slab_l, uh, ul)
            nh = jnp.where(live, nh, slab_h)
            nl = jnp.where(live, nl, slab_l)
            xh = lax.dynamic_update_slice(xh, nh, (off[lj], 0))
            xl = lax.dynamic_update_slice(xl, nl, (off[lj], 0))
    return xh, xl


@functools.partial(
    jax.jit,
    static_argnames=("n", "nb", "mesh", "s", "w", "precise_deg", "refine",
                     "slice_reuse", "interpret"))
def _potrf_df64_jit_n(xh, xl, n, nb, mesh, s, w, precise_deg, refine,
                      slice_reuse, interpret):
    nt = n // nb
    local = functools.partial(
        _potrf_local_packed_df64, nb=nb, nt=nt, ndev=mesh.size,
        s=s, w=w, precise_deg=precise_deg, refine=refine,
        slice_reuse=slice_reuse, interpret=interpret,
    )
    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P("d", None), P("d", None)),
        out_specs=(P("d", None), P("d", None)),
        check_vma=False,
    )(xh, xl)


def potrf_packed_cyclic_df64(
    xh: jax.Array,
    xl: jax.Array,
    n: int,
    nb: int,
    mesh: Mesh,
    *,
    s: int = 7,
    w: int = 8,
    precise_deg: int = 3,
    refine: int = 2,
    slice_reuse: bool = True,
    interpret: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Distributed **emulated-fp64** POTRF of a packed column-cyclic
    sharded (hi, lo) pair (each plane laid out by
    :func:`pack_cols_packed`) — the reference's fp64 distributed
    contract (``worker_distrib.cpp:238`` fp64 tile kernels under the
    ``client_distrib.cpp:506-565`` wave DAG) re-based on df64 arithmetic
    + the Pallas ring data plane. Same shape/mesh constraints as
    :func:`potrf_packed_cyclic`; returns the factor pair in the same
    packed layout. Meets the 1e-10 gate (the factor carries ~49 mantissa
    bits; residual ~n·2^(−s·w))."""
    if n % nb:
        raise ValueError(f"n={n} must be a multiple of nb={nb}")
    nt = n // nb
    if nt % mesh.size:
        raise ValueError(
            f"nt={nt} tile columns must be a multiple of mesh size "
            f"{mesh.size}")
    if len(mesh.axis_names) != 1:
        raise ValueError(
            "potrf_packed_cyclic_df64 needs a flat 1-D mesh (Pallas remote "
            "DMA cannot address multi-axis meshes)")
    _, _, _, off = _geometry(n, nb, mesh.size)
    want = (off[-1] * mesh.size, nb)
    if xh.shape != want or xl.shape != want:
        raise ValueError(
            f"packed pair shapes {xh.shape}/{xl.shape} != {want}"
            " — build them with pack_cols_packed")
    return _potrf_df64_jit_n(
        xh, xl, n, nb, mesh, s, w, precise_deg, refine, slice_reuse,
        interpret)


def resident_elems(n: int, nb: int, ndev: int) -> tuple[int, int]:
    """(packed-cyclic per-device elements, dense column-cyclic ditto) —
    the memory claim in the module docstring, used by tests and the
    scaling model."""
    _, _, _, off = _geometry(n, nb, ndev)
    return off[-1] * nb, (n // ndev) * n
