"""Multi-host (multi-process) distributed POTRF.

The reference's L4 is genuinely inter-node: a gRPC client farms tile tasks
to workers on other machines (``client_distrib.cpp:325-353``; worker serves
over sockets, ``worker_distrib.cpp:579-594``). The TPU-native equivalent is
the JAX distributed runtime: every process calls
``jax.distributed.initialize`` against a shared coordinator, after which
``jax.devices()`` spans *all* hosts and the same single-controller
``shard_map`` program — ``potrf_block_cyclic``, unchanged — runs SPMD
across them; panel broadcasts become ICI/DCN collectives instead of blob
fetches (SURVEY §5.8 "TPU-native equivalent").

Two entry points:

- :func:`initialize` — thin wrapper for real deployments.
- ``python -m dla_tpu.parallel.multihost`` — one *process* of a multi-host
  demo job on CPU devices (each process contributes
  ``--local-devices`` virtual devices), used by ``tests/test_multihost.py``
  to prove the capability with 2 processes × 4 devices without a cluster:
  generation is tile-local on each process's shards, the factorization is
  the production ``potrf_block_cyclic``, and the result is validated to the
  reference's 1e-10 fp64 gate on process 0.
"""

from __future__ import annotations

import argparse
import os
import sys


def initialize(
    coordinator_address: str,
    num_processes: int,
    process_id: int,
    local_device_ids=None,
) -> None:
    """Join this process to the JAX distributed runtime (idempotent).

    ↔ the reference client's ``ChannelFactory.create_channel`` handshake
    (``client_distrib.cpp:330-331``) — except afterwards there is no RPC
    surface at all: devices on every host appear in ``jax.devices()`` and
    collectives ride the fabric.
    """
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )


def _demo(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="dla-multihost-demo")
    ap.add_argument("--coordinator", required=True, help="host:port")
    ap.add_argument("--nproc", type=int, required=True)
    ap.add_argument("--pid", type=int, required=True)
    ap.add_argument("--local-devices", type=int, default=4)
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--nb", type=int, default=8)
    ap.add_argument("--p", type=int, default=2)
    ap.add_argument("--q", type=int, default=4)
    args = ap.parse_args(argv)

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.local_devices}"
        ).strip()

    import jax

    # the axon sitecustomize pins jax_platforms="axon,cpu"; this demo is a
    # CPU-fleet capability proof and must not touch the TPU tunnel
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    initialize(args.coordinator, args.nproc, args.pid)

    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dla_tpu.parallel import (
        BlockCyclicLayout,
        generate_spd_block_cyclic,
        make_mesh,
        potrf_block_cyclic,
    )

    ndev = len(jax.devices())
    assert ndev == args.nproc * args.local_devices, (
        f"expected {args.nproc}x{args.local_devices} global devices, got {ndev}"
    )
    print(
        f"[mh {args.pid}] {jax.process_count()} processes, "
        f"{ndev} global devices ({jax.local_device_count()} local)",
        flush=True,
    )

    import jax.numpy as jnp

    layout = BlockCyclicLayout(n=args.n, nb=args.nb, p=args.p, q=args.q)
    mesh = make_mesh(args.p, args.q)
    # tile-local fp64 generation — no host matrix, and the 1e-10 gate is real
    x = generate_spd_block_cyclic(layout, mesh, seed=51, dtype=jnp.float64)
    lx = potrf_block_cyclic(x, layout, mesh)

    # replicate the (tiny) factored matrix so every process can address it;
    # XLA inserts the all-gather — the multi-host analogue of the client
    # downloading result blobs, minus the blob store
    rep = jax.jit(lambda v: v, out_shardings=NamedSharding(mesh, P()))
    stored_l = np.asarray(rep(lx))
    stored_a = np.asarray(rep(x))

    if args.pid == 0:
        inv = np.ix_(layout.row_perm, layout.col_perm)
        a = np.empty_like(stored_a)
        a[inv] = stored_a
        lfac = np.empty_like(stored_l)
        lfac[inv] = stored_l
        lfac = np.tril(lfac)
        asym = np.tril(a) + np.tril(a, -1).T
        rec = lfac @ lfac.T
        res = np.abs(asym - rec).sum(axis=1).max() / np.abs(asym).sum(axis=1).max()
        gate = 1e-10
        status = "PASS" if res < gate else "FAIL"
        print(f"[mh 0] ||A - LL^T||_inf / ||A||_inf = {res:.2e} {status}", flush=True)
        if status == "FAIL":
            return 1
    # all processes must reach shutdown together (collective teardown)
    jax.distributed.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(_demo())
