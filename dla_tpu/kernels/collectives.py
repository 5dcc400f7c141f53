"""Pallas ICI ring collectives — RDMA-native panel broadcast.

The reference's inter-node data plane is a gRPC blob store with per-task
round trips (SURVEY §5.8); the standard TPU-native replacement used by
``parallel.potrf_dist`` is XLA collectives (``psum`` / ``all_gather``).
This module goes one level lower: the panel exchange as an explicit Pallas
**ring of inter-chip remote DMAs** (``make_async_remote_copy``), the
building block for overlapping the panel broadcast of step k+1 with the
trailing update of step k (lookahead) — the roadmap's multi-chip lever.

Semantics: :func:`ring_all_gather` must be called inside ``shard_map`` and
is equivalent to ``lax.all_gather(x, axis_name, tiled=True)`` for a 1-D
ring. Each step sends the most-recently received chunk to the right
neighbor while the output assembles in place; buffers are double-slotted
so send/receive of consecutive steps don't collide, and the per-step
``wait`` on both send and receive semaphores is the ring synchronization.

Validated in interpret mode on a virtual device mesh (tests) — interpret
mode emulates the inter-device DMAs — and structured per the TPU kernel
guide's ring-collective pattern for on-hardware use (``collective_id``
set; sequential grid).

Limitation (current JAX/Pallas): remote-DMA device addressing only supports
**single-named-axis meshes** — re-verified this round: the dma_start
discharge rule raises ``NotImplementedError`` for both LOGICAL and MESH
device-id forms on >1 named axis. The supported route onto a PxQ grid is
the **flat-mesh re-expression**: one named axis of size P·Q, with the
process-grid arithmetic (r = id // Q, c = id % Q) done in the SPMD program.
:func:`ring_all_gather` takes ``groups=Q`` for exactly this — independent
sub-rings of size Q within the flat axis, the row-broadcast pattern of the
block-cyclic factorization.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _ring_kernel(
    x_ref, out_ref, comm, send_sem, recv_sem, *, axis_name: str, group: int
):
    # Sub-ring arithmetic on the flat axis: device id = r·group + c, the
    # ring runs over c within each row group r (group == axis size is the
    # plain full-axis ring).
    my = lax.axis_index(axis_name)
    base = (my // group) * group
    c = my % group
    m = x_ref.shape[0]
    out_ref[pl.ds(c * m, m), :] = x_ref[:]
    comm[0] = x_ref[:]

    def body(step, _):
        dst = base + (c + 1) % group
        src = (c - step - 1) % group
        sslot = step % 2
        rslot = (step + 1) % 2
        rdma = pltpu.make_async_remote_copy(
            src_ref=comm.at[sslot],
            dst_ref=comm.at[rslot],
            send_sem=send_sem.at[sslot],
            recv_sem=recv_sem.at[rslot],
            device_id=dst,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
        rdma.start()
        rdma.wait()
        out_ref[pl.ds(src * m, m), :] = comm[rslot]
        return 0

    lax.fori_loop(0, group - 1, body, 0)


def _bcast_kernel(
    x_ref, out_ref, comm, send_sem, recv_sem, *, axis_name: str,
    group: int, root: int,
):
    """Uniform-DMA ring broadcast: every device forwards its comm slot every
    step (no control divergence — conditional DMA in SPMD rings deadlocks),
    and captures into ``out`` only at the step matching its ring distance
    from the root. After t steps ``comm[d] == x[d - t]``, so device d holds
    the root's block exactly at t = (d − root) mod group."""
    my = lax.axis_index(axis_name)
    base = (my // group) * group
    c = my % group
    dist = (c - root) % group
    out_ref[...] = x_ref[...]
    comm[0] = x_ref[...]

    def body(step, _):
        sslot = step % 2
        rslot = (step + 1) % 2
        rdma = pltpu.make_async_remote_copy(
            src_ref=comm.at[sslot],
            dst_ref=comm.at[rslot],
            send_sem=send_sem.at[sslot],
            recv_sem=recv_sem.at[rslot],
            device_id=base + (c + 1) % group,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
        rdma.start()
        rdma.wait()
        take = dist == step + 1
        out_ref[...] = jnp.where(take, comm[rslot], out_ref[...])
        return 0

    lax.fori_loop(0, group - 1, body, 0)


def ring_broadcast(
    x: jax.Array,
    axis_name: str,
    root: int,
    *,
    group: int | None = None,
    collective_id: int = 0,
    interpret: bool | None = None,
) -> jax.Array:
    """Broadcast the ``root`` device's block (m, n) to every device on the
    ring via pipelined forwarding — the RDMA-native panel broadcast for the
    factorization's panel step (the XLA equivalent is a masked ``psum``,
    which moves the same bytes but cannot overlap with unrelated compute the
    way an explicitly scheduled ring can). ``root`` is the group-local
    device index and must be static — in the unrolled factorization it is
    the trace-time panel owner ``k % Q``. ``group`` as in
    :func:`ring_all_gather` — sub-rings within a flat axis. Must be called
    inside ``shard_map``."""
    if x.ndim != 2:
        raise ValueError(f"ring_broadcast expects a 2-D block, got {x.shape}")
    interpret = _interpret() if interpret is None else interpret
    ndev = lax.axis_size(axis_name)
    if group is None:
        group = ndev
    if ndev % group:
        raise ValueError(f"axis size {ndev} not a multiple of group {group}")
    m, n = x.shape
    return pl.pallas_call(
        functools.partial(
            _bcast_kernel, axis_name=axis_name, group=group, root=int(root)
        ),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, m, n), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            collective_id=collective_id, has_side_effects=True
        ),
        interpret=interpret,
    )(x)


def ring_all_gather(
    x: jax.Array,
    axis_name: str,
    *,
    group: int | None = None,
    collective_id: int = 0,
    interpret: bool | None = None,
) -> jax.Array:
    """All-gather ``x`` (shape (m, n) per device) along a 1-D mesh axis via
    a uni-directional RDMA ring. Returns (group·m, n), chunks ordered by
    device index — drop-in for ``lax.all_gather(x, axis, tiled=True)``.
    Must be called inside ``shard_map``.

    ``group`` (default: the full axis size) runs **independent sub-rings**
    of that size within the flat axis — the flat-mesh expression of a PxQ
    process grid's row broadcast (device id = r·group + c, ring over c;
    equivalent to ``lax.all_gather`` with ``axis_index_groups`` of
    consecutive blocks). The axis size must be a multiple of ``group``."""
    if x.ndim != 2:
        raise ValueError(f"ring_all_gather expects a 2-D block, got {x.shape}")
    interpret = _interpret() if interpret is None else interpret
    ndev = lax.axis_size(axis_name)
    if group is None:
        group = ndev
    if ndev % group:
        raise ValueError(f"axis size {ndev} not a multiple of group {group}")
    m, n = x.shape
    return pl.pallas_call(
        functools.partial(_ring_kernel, axis_name=axis_name, group=group),
        out_shape=jax.ShapeDtypeStruct((group * m, n), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, m, n), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            collective_id=collective_id, has_side_effects=True
        ),
        interpret=interpret,
    )(x)
