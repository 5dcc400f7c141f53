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


def resident_elems(n: int, nb: int, ndev: int) -> tuple[int, int]:
    """(packed-cyclic per-device elements, dense column-cyclic ditto) —
    the memory claim in the module docstring, used by tests and the
    scaling model."""
    _, _, _, off = _geometry(n, nb, ndev)
    return off[-1] * nb, (n // ndev) * n
