"""Column-cyclic distributed POTRF on a FLAT device mesh with the Pallas
RDMA ring as the panel data plane.

Why this exists: the PxQ block-cyclic path (``parallel.potrf_dist``) moves
panels with XLA collectives (masked ``psum`` + ``all_gather``) because
current Pallas remote DMA cannot address multi-named-axis meshes (see
``kernels/collectives.py``). This module is the supported flat-mesh
expression: a 1-D mesh of D devices, tile column j owned by device
j mod D (the classic 1-D cyclic distribution — the reference's ArmoniK
DAG distributes tiles the same ownership-by-index way,
``client_distrib.cpp:506-565``), and the per-step panel broadcast is an
explicit :func:`~dla_tpu.kernels.collectives.ring_broadcast` — inter-chip
RDMA hops the scheduler can overlap with trailing GEMMs, instead of a
compiler-scheduled collective.

Algorithm (right-looking, trace-time unrolled, lower triangle only):

1. the owner column solves panel k (chol of the diagonal tile + one
   batched TRSM of the rows below);
2. the solved panel rides the ring to the other D−1 devices (two
   broadcasts: the nb×nb factor tile, then the (N−(k+1)·nb)×nb panel);
3. every device updates its local tile columns right of k from a static
   staircase row start (``max(k+1, lj·D)·nb`` — garbage above the global
   diagonal is never read back, exactly the lower-only contract the
   single-chip paths use).

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


def make_flat_mesh(ndev: int) -> Mesh:
    """A 1-D ('d',) mesh over the first ``ndev`` devices."""
    return Mesh(np.asarray(jax.devices()[:ndev]), ("d",))


def _col_perm(n: int, nb: int, ndev: int) -> np.ndarray:
    """Column permutation grouping each device's cyclic tile columns
    contiguously (cyclic → blocked, columns only)."""
    nt = n // nb
    order = []
    for d in range(ndev):
        for j in range(d, nt, ndev):
            order.extend(range(j * nb, (j + 1) * nb))
    return np.asarray(order)


def from_dense_cols(a: jax.Array, nb: int, mesh: Mesh) -> jax.Array:
    """Permute + shard a dense (n, n) matrix column-cyclically over the
    flat mesh (rows stay whole on every device)."""
    ndev = mesh.size
    perm = _col_perm(a.shape[1], nb, ndev)
    return jax.device_put(a[:, perm], NamedSharding(mesh, P(None, "d")))


def to_dense_cols(x: jax.Array, nb: int, mesh: Mesh) -> np.ndarray:
    """Inverse of :func:`from_dense_cols` (gathers to host)."""
    perm = _col_perm(x.shape[1], nb, mesh.size)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.size)
    return np.asarray(x)[:, inv]


def _potrf_local_ring(x, *, nb: int, nt: int, ndev: int, interpret: bool | None):
    """Per-device SPMD program (runs under shard_map on the flat mesh)."""
    n = nt * nb
    ltc = nt // ndev
    c = lax.axis_index("d")
    dtype = x.dtype
    zero = jnp.zeros((), dtype)
    # global tile column of each local element column
    gtcol = (jnp.arange(ltc * nb) // nb) * ndev + c

    for k in range(nt):
        kc, ljk = k % ndev, k // ndev
        row0, row1 = k * nb, (k + 1) * nb
        own = c == kc

        # -- panel solve on the owner (cond: real HLO branch) --------------
        dblk = x[row0:row1, ljk * nb : (ljk + 1) * nb]
        colw = x[row1:, ljk * nb : (ljk + 1) * nb]  # (n-row1, nb)

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

        # -- ring data plane: factor tile + panel hop device-to-device -----
        lkk = ring_broadcast(lkk, "d", kc, collective_id=0, interpret=interpret)
        cur_d = x[row0:row1, ljk * nb : (ljk + 1) * nb]
        x = x.at[row0:row1, ljk * nb : (ljk + 1) * nb].set(
            jnp.where(own, lkk, cur_d)
        )
        if k == nt - 1:
            break
        panel = ring_broadcast(
            solved, "d", kc, collective_id=1, interpret=interpret
        )
        cur_c = x[row1:, ljk * nb : (ljk + 1) * nb]
        x = x.at[row1:, ljk * nb : (ljk + 1) * nb].set(
            jnp.where(own, panel, cur_c)
        )

        # -- trailing update, static staircase row starts -------------------
        for lj in range((k + 1) // ndev, ltc):
            j0, j1 = lj * nb, (lj + 1) * nb
            gcol = lj * ndev + c  # traced
            rs = max(k + 1, lj * ndev) * nb  # device-independent envelope
            if rs >= n:
                continue
            # B operand: panel rows of global tile gcol (traced offset —
            # clamped for columns ≤ k, masked to zero below)
            off = jnp.maximum(gcol * nb - row1, 0)
            b = lax.dynamic_slice(panel, (off, jnp.zeros_like(off)), (nb, nb))
            b = jnp.where((gtcol[j0:j1] > k)[:, None], b, zero)
            a_rows = panel[rs - row1 :]
            upd = jnp.matmul(
                a_rows,
                b.T,
                preferred_element_type=(
                    jnp.float32 if dtype in (jnp.bfloat16, jnp.float16) else dtype
                ),
            )
            x = x.at[rs:, j0:j1].add(-upd.astype(dtype))
    return x


@functools.partial(jax.jit, static_argnames=("nb", "mesh", "interpret"))
def _potrf_jit(x, nb: int, mesh: Mesh, interpret: bool | None):
    n = x.shape[0]
    nt = n // nb
    local = functools.partial(
        _potrf_local_ring, nb=nb, nt=nt, ndev=mesh.size, interpret=interpret
    )
    return jax.shard_map(
        local, mesh=mesh, in_specs=P(None, "d"), out_specs=P(None, "d"),
        check_vma=False,
    )(x)


def potrf_column_cyclic_ring(
    x: jax.Array,
    nb: int,
    mesh: Mesh,
    *,
    interpret: bool | None = None,
) -> jax.Array:
    """Distributed POTRF of a column-cyclic sharded matrix (see
    :func:`from_dense_cols`) with ring-RDMA panel broadcasts. Requires
    nt = n/nb to be a multiple of the (flat) mesh size. Returns the factor
    in the same layout; only the lower triangle is meaningful."""
    n = x.shape[0]
    if n % nb:
        raise ValueError(f"n={n} must be a multiple of nb={nb}")
    nt = n // nb
    if nt % mesh.size:
        raise ValueError(
            f"nt={nt} tile columns must be a multiple of mesh size {mesh.size}"
        )
    if len(mesh.axis_names) != 1:
        raise ValueError(
            "potrf_column_cyclic_ring needs a flat 1-D mesh (Pallas remote "
            "DMA cannot address multi-axis meshes); use make_flat_mesh"
        )
    return _potrf_jit(x, nb, mesh, interpret)
