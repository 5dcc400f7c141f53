"""Mosaic compile + execution probe of the Pallas ring data plane on the
real TPU chip (VERDICT r3 next-round #1).

Every multi-chip Pallas claim (kernels/collectives.py ring_broadcast /
ring_all_gather and their callers parallel/column_cyclic.py,
parallel/packed_cyclic.py) was validated in interpret mode only — and this
repo's own r1 history shows interpret mode is not predictive of Mosaic
(CLAUDE.md: "Mosaic rejects dynamic indexing of loop-carried values").
One chip cannot run a >1-device ring, but it CAN:

1. Mosaic-lower + execute a degenerate 1-device ring (group=1): the
   kernel body — including the `make_async_remote_copy` RDMA — is traced
   into the fori_loop regardless of its trip count;
2. Mosaic-lower + execute SELF-RDMA hops: group=1 with chunks>1 gives
   chunks−1 real loop iterations whose DMA target is the device itself —
   the full remote-copy code path (descriptor, start, semaphore waits)
   executes on hardware;
3. compile + run the actual distributed callers (column-cyclic and packed
   column-cyclic POTRF) on a 1-device flat TPU mesh at toy N with the
   factor validated;
4. (stretch) AOT-compile the 8-device program against a v5e topology
   description, if this remote compile service supports cross-topology
   AOT.

Each probe logs PASS/FAIL with the full exception on failure — a specific
Mosaic rejection is exactly the evidence the probe exists to surface.

Run (one TPU process at a time, never kill mid-compile — CLAUDE.md):
    setsid nohup python benchmarks/ring_mosaic_compile.py \
        > benchmarks/results_r4/ring_mosaic_compile.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def log(*a):
    print(*a, flush=True)


def probe(name):
    def deco(fn):
        def run():
            t0 = time.perf_counter()
            log(f"--- probe: {name}")
            try:
                msg = fn()
                log(f"PASS {name} ({time.perf_counter() - t0:.1f}s)"
                    + (f" — {msg}" if msg else ""))
                return True
            except Exception:
                log(f"FAIL {name} ({time.perf_counter() - t0:.1f}s)")
                traceback.print_exc(file=sys.stdout)
                return False
        run.__name__ = name
        return run
    return deco


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, PartitionSpec as P

    log(f"backend={jax.default_backend()} devices={jax.devices()}")
    if jax.default_backend() != "tpu":
        log("NOT a TPU backend — this probe is meaningless off-chip; abort")
        sys.exit(2)

    # absorb the compile service's first-contact stall outside any timing
    t0 = time.perf_counter()
    _ = float(jnp.linalg.norm(jnp.ones((256, 256), jnp.float32)))
    log(f"device warmup: {time.perf_counter() - t0:.1f}s")

    from dla_tpu.kernels.collectives import ring_all_gather, ring_broadcast

    mesh1 = Mesh(np.asarray(jax.devices()[:1]), ("d",))

    @probe("ring_broadcast group=1 chunks=1 (degenerate ring, Mosaic lower)")
    def p1():
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal((256, 128)),
            jnp.float32)
        f = jax.jit(jax.shard_map(
            lambda xl: ring_broadcast(xl, "d", 0),
            mesh=mesh1, in_specs=P(None, None), out_specs=P(None, None),
            check_vma=False))
        lowered = f.lower(x)
        txt = lowered.as_text()
        has_dma = ("dma_start" in txt or "tpu.enqueue_dma" in txt
                   or "make_async_remote_copy" in txt or "dma" in txt.lower())
        compiled = lowered.compile()
        del compiled
        out = np.asarray(f(x))
        np.testing.assert_array_equal(out, np.asarray(x))
        return (f"Mosaic lowered + executed; DMA visible in stablehlo: "
                f"{has_dma}")

    @probe("ring_broadcast group=1 chunks=8 (SELF-RDMA hops execute)")
    def p2():
        # chunks=8 on a 1-ring: 7 real fori iterations, each a
        # make_async_remote_copy whose device_id is this very chip —
        # descriptor build, start, send+recv semaphore waits all execute.
        x = jnp.asarray(
            np.random.default_rng(1).standard_normal((256, 128)),
            jnp.float32)
        f = jax.jit(jax.shard_map(
            lambda xl: ring_broadcast(xl, "d", 0, chunks=8),
            mesh=mesh1, in_specs=P(None, None), out_specs=P(None, None),
            check_vma=False))
        out = np.asarray(f(x))
        np.testing.assert_array_equal(out, np.asarray(x))
        return "7 self-RDMA hops executed, output bit-exact"

    @probe("ring_all_gather group=1 (degenerate, Mosaic lower + execute)")
    def p3():
        x = jnp.asarray(
            np.random.default_rng(2).standard_normal((128, 128)),
            jnp.float32)
        f = jax.jit(jax.shard_map(
            lambda xl: ring_all_gather(xl, "d"),
            mesh=mesh1, in_specs=P(None, None), out_specs=P(None, None),
            check_vma=False))
        out = np.asarray(f(x))
        np.testing.assert_array_equal(out, np.asarray(x))
        return "Mosaic lowered + executed"

    @probe("potrf_column_cyclic_ring on a 1-device TPU mesh (toy N)")
    def p4():
        import scipy.linalg

        from dla_tpu.ops import plgsy
        from dla_tpu.parallel import (
            from_dense_cols, potrf_column_cyclic_ring, to_dense_cols,
        )

        n, nb = 512, 128
        a = plgsy(n, seed=51, dtype=jnp.float32)
        x = from_dense_cols(a, nb, mesh1)
        lx = potrf_column_cyclic_ring(x, nb, mesh1)
        l = np.tril(to_dense_cols(lx, nb, mesh1))
        ref = scipy.linalg.cholesky(
            np.asarray(a, np.float64), lower=True)
        err = np.max(np.abs(l - ref)) / np.max(np.abs(ref))
        assert err < 1e-4, err
        return f"factor matches scipy fp64 to {err:.2e} (fp32 storage)"

    @probe("potrf_packed_cyclic on a 1-device TPU mesh (toy N)")
    def p5():
        import scipy.linalg

        from dla_tpu.ops import plgsy
        from dla_tpu.parallel import (
            pack_cols_packed, potrf_packed_cyclic, unpack_cols_packed,
        )

        n, nb = 512, 128
        a = plgsy(n, seed=7, dtype=jnp.float32)
        x = pack_cols_packed(np.asarray(a), nb, mesh1)
        lx = potrf_packed_cyclic(x, n, nb, mesh1)
        l = unpack_cols_packed(lx, n, nb, mesh1)
        ref = scipy.linalg.cholesky(np.asarray(a, np.float64), lower=True)
        err = np.max(np.abs(l - ref)) / np.max(np.abs(ref))
        assert err < 1e-4, err
        return f"factor matches scipy fp64 to {err:.2e} (fp32 storage)"

    def _topology():
        from jax.experimental import topologies

        for name in ("v5e:2x4", "v5e:1x8", "tpu_v5_lite:2x4"):
            try:
                topo = topologies.get_topology_desc(
                    platform="tpu", topology_name=name)
                log(f"  topology {name}: {len(topo.devices)} devices")
                return topo
            except Exception as e:
                log(f"  topology {name} unavailable: {type(e).__name__}: {e}")
        raise RuntimeError("no v5e topology description available")

    @probe("AOT 8-device v5e topology compile (stretch)")
    def p6():
        topo = _topology()
        tmesh = Mesh(np.asarray(topo.devices).reshape(-1), ("d",))
        x = jax.ShapeDtypeStruct((8 * 64, 128), jnp.float32)
        f = jax.jit(jax.shard_map(
            lambda xl: ring_broadcast(xl, "d", 3),
            mesh=tmesh, in_specs=P("d", None), out_specs=P("d", None),
            check_vma=False))
        compiled = f.lower(x).compile()
        del compiled
        return "8-device ring_broadcast AOT-compiled against v5e topology"

    @probe("AOT 8-device FULL packed-cyclic POTRF compile (stretch)")
    def p7():
        from dla_tpu.parallel import packed_cyclic

        topo = _topology()
        tmesh = Mesh(np.asarray(topo.devices).reshape(-1), ("d",))
        n, nb, ndev = 2048, 128, 8
        _, _, _, off = packed_cyclic._geometry(n, nb, ndev)
        x = jax.ShapeDtypeStruct((off[-1] * ndev, nb), jnp.float32)
        lowered = packed_cyclic._potrf_jit_n.lower(x, n, nb, tmesh, None)
        compiled = lowered.compile()
        del compiled
        return ("full 8-device packed column-cyclic factorization (16 ring "
                "broadcasts/step data plane) Mosaic-AOT-compiled for v5e:2x4")

    @probe("AOT 8-device FULL column-cyclic POTRF compile (stretch)")
    def p8():
        from dla_tpu.parallel import column_cyclic

        topo = _topology()
        tmesh = Mesh(np.asarray(topo.devices).reshape(-1), ("d",))
        n, nb = 2048, 128
        x = jax.ShapeDtypeStruct((n, n), jnp.float32)
        lowered = column_cyclic._potrf_jit.lower(x, nb, tmesh, None)
        compiled = lowered.compile()
        del compiled
        return ("full 8-device column-cyclic factorization "
                "Mosaic-AOT-compiled for v5e:2x4")

    results = [p() for p in (p1, p2, p3, p4, p5, p6, p7, p8)]
    n_ok = sum(results)
    log(f"=== {n_ok}/{len(results)} probes passed "
        f"(p6-p8 are stretch goals; p1-p5 are the Mosaic floor) ===")
    sys.exit(0 if all(results[:5]) else 1)


if __name__ == "__main__":
    main()
