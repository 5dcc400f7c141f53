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
mode emulates the inter-device DMAs — and Mosaic-compiled/executed on the
real chip by the r4 probe (degenerate ring, self-RDMA hops, 8-device AOT
topology compile; ``benchmarks/results_r4/ring_mosaic_compile.log``).
``collective_id`` is accepted for caller-side bookkeeping but NOT passed
to the compiler: Mosaic only allows it for kernels using a custom barrier
semaphore (r4 probe finding).

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


def broadcast_chunks(m: int, group: int) -> int:
    """Pipeline chunk count :func:`ring_broadcast` uses for an ``m``-row
    buffer on a ``group``-device ring (and that the scaling model charges —
    ``parallel/model.py`` imports this so the projected time law and the
    implemented kernel cannot drift apart).

    The store-and-forward cost of an unchunked ring broadcast is
    ``(D−1)·(V/bw + lat)``; splitting into C chunks pipelines the hops to
    ``(C + D − 2)·(V/(C·bw) + lat)`` → ``V/bw`` for large C. Picks the
    largest C ≤ 16·(D−1) (bandwidth overhead (D−2)/C ≤ ~6%; near the
    optimal C* = √((D−2)·V/(bw·lat)) ≈ 70 for an nb=4096 f32 tile on a
    v5e link) that divides ``m`` into sublane-aligned chunks
    (rows % 16 == 0 covers f32 and bf16 tiling); 1 when the buffer is too
    small to split (≤ one tile of rows), which degenerates to exactly the
    pre-chunking kernel."""
    if group <= 1:
        return 1
    for c in range(min(16 * (group - 1), m // 16), 0, -1):
        if m % c == 0 and (m // c) % 16 == 0:
            return c
    return 1


def _bcast_kernel(
    x_ref, out_ref, comm, send_sem, recv_sem, *, axis_name: str,
    group: int, root: int, chunks: int,
):
    """Chunk-pipelined uniform-DMA ring broadcast. Every device forwards its
    comm slot every step (no DMA divergence — conditional DMA in SPMD rings
    deadlocks); the root injects chunk min(t, C−1) into its send slot at
    step t, so the chunk front advances one hop per step and device at ring
    distance d captures chunk ``t − (d−1)`` at step t. Total steps
    C + group − 2; with C = 1 this is exactly the old store-and-forward
    kernel (capture at t = d−1). Duplicate chunks travel behind the front
    once the root runs out (t ≥ C) and are never captured — their capture
    index falls outside [0, C)."""
    my = lax.axis_index(axis_name)
    base = (my // group) * group
    c = my % group
    dist = (c - root) % group
    is_root = dist == 0
    m = x_ref.shape[0]
    mc = m // chunks
    out_ref[...] = x_ref[...]
    comm[0] = x_ref[pl.ds(0, mc), :]

    def body(t, _):
        sslot = t % 2
        rslot = (t + 1) % 2

        @pl.when(jnp.logical_and(is_root, t > 0))
        def _():
            cidx = jnp.minimum(t, chunks - 1)
            comm[sslot] = x_ref[pl.ds(cidx * mc, mc), :]

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
        cap = t - (dist - 1)
        take = jnp.logical_and(
            jnp.logical_not(is_root),
            jnp.logical_and(cap >= 0, cap < chunks),
        )

        @pl.when(take)
        def _():
            out_ref[pl.ds(jnp.maximum(cap, 0) * mc, mc), :] = comm[rslot]

        return 0

    lax.fori_loop(0, chunks + group - 2, body, 0)


def ring_broadcast(
    x: jax.Array,
    axis_name: str,
    root: int,
    *,
    group: int | None = None,
    chunks: int | None = None,
    collective_id: int = 0,
    interpret: bool | None = None,
) -> jax.Array:
    """Broadcast the ``root`` device's block (m, n) to every device on the
    ring via chunk-pipelined forwarding — the RDMA-native panel broadcast
    for the factorization's panel step (the XLA equivalent is a masked
    ``psum``, which moves the same bytes but cannot overlap with unrelated
    compute the way an explicitly scheduled ring can). ``root`` is the
    group-local device index and must be static — in the unrolled
    factorization it is the trace-time panel owner ``k % Q``. ``group`` as
    in :func:`ring_all_gather` — sub-rings within a flat axis. ``chunks``
    (default :func:`broadcast_chunks`) splits the buffer into row chunks so
    hops pipeline: cost (C + D − 2)·(V/(C·bw) + lat) instead of
    store-and-forward's (D − 1)·(V/bw + lat) — the time law
    ``parallel/model.py`` charges. Must be called inside ``shard_map``."""
    if x.ndim != 2:
        raise ValueError(f"ring_broadcast expects a 2-D block, got {x.shape}")
    interpret = _interpret() if interpret is None else interpret
    ndev = lax.axis_size(axis_name)
    if group is None:
        group = ndev
    if ndev % group:
        raise ValueError(f"axis size {ndev} not a multiple of group {group}")
    m, n = x.shape
    if chunks is None:
        chunks = broadcast_chunks(m, group)
    if m % chunks:
        raise ValueError(f"chunks={chunks} must divide the {m} buffer rows")
    return pl.pallas_call(
        functools.partial(
            _bcast_kernel, axis_name=axis_name, group=group, root=int(root),
            chunks=chunks,
        ),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, m // chunks, n), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        # collective_id is NOT forwarded: Mosaic rejects it for kernels
        # that don't use a custom barrier semaphore ("collective_id has to
        # be unspecified or None when not using a custom barrier" — found
        # by the r4 on-chip probe, results_r4/ring_mosaic_compile.log;
        # interpret mode never surfaced this). The per-step DMA-semaphore
        # waits are the ring synchronization.
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
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
        # no collective_id — see ring_broadcast (Mosaic rejects it without
        # a custom barrier; r4 probe finding)
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(x)
