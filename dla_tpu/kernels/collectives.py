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
**single-named-axis meshes** (LOGICAL ids reject multi-axis meshes, and the
MESH dict form trips on traced ids in this version), so this collective
cannot yet be dropped into the 2-D ('r','c') factorization mesh — wiring it
into ``potrf_dist`` is a roadmap item pending upstream multi-axis support
(or a flat-mesh re-expression of the PxQ grid).
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


def _ring_kernel(x_ref, out_ref, comm, send_sem, recv_sem, *, axis_name: str):
    ndev = lax.axis_size(axis_name)
    my = lax.axis_index(axis_name)
    m = x_ref.shape[0]
    out_ref[pl.ds(my * m, m), :] = x_ref[:]
    comm[0] = x_ref[:]

    def body(step, _):
        dst = (my + 1) % ndev
        src = (my - step - 1) % ndev
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

    lax.fori_loop(0, ndev - 1, body, 0)


def ring_all_gather(
    x: jax.Array,
    axis_name: str,
    *,
    collective_id: int = 0,
    interpret: bool | None = None,
) -> jax.Array:
    """All-gather ``x`` (shape (m, n) per device) along a 1-D mesh axis via
    a uni-directional RDMA ring. Returns (axis_size·m, n), chunks ordered by
    device index — drop-in for ``lax.all_gather(x, axis, tiled=True)``.
    Must be called inside ``shard_map``."""
    if x.ndim != 2:
        raise ValueError(f"ring_all_gather expects a 2-D block, got {x.shape}")
    interpret = _interpret() if interpret is None else interpret
    ndev = lax.axis_size(axis_name)
    m, n = x.shape
    return pl.pallas_call(
        functools.partial(_ring_kernel, axis_name=axis_name),
        out_shape=jax.ShapeDtypeStruct((ndev * m, n), x.dtype),
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
