"""Multi-chip serving: sharded explicit-inverse apply + its scaling model.

The single-chip serving study (docs/STATUS_r3.md session 8) showed the
explicit-inverse path (:func:`dla_tpu.algos.potri` once, then one MXU
GEMM per query) wins the factor-resident serving regime. Scaling that
out is embarrassingly parallel in the TPU-native idiom: shard A⁻¹'s
*rows* over the mesh, replicate the (n, nrhs) query block, compute the
local (n/P, nrhs) slab, and all-gather the result — one collective of
n·nrhs elements per query, vs the factor-panel broadcasts a distributed
triangular solve would need every block step (the reference has no
serving path at all; its workers exchange tiles per task —
``worker_distrib.cpp:323``).

:func:`project_serving` models when the mesh pays, in the same style as
:func:`dla_tpu.parallel.model.project`: compute calibrated by *measured*
single-chip serving rates (``results_r3/solve_latency_probe.jsonl``),
comm from the all-gather volume — which ``tests/test_model.py`` pins to
the compiled HLO of :func:`solve_inverse_sharded`.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dla_tpu.utils.precision import matmul_precision


def make_serving_mesh(p: int, devices=None) -> Mesh:
    """A flat 1-D mesh with axis 'd' — serving shards one way (rows)."""
    if devices is None:
        devices = jax.devices()
    if len(devices) < p:
        raise ValueError(f"need {p} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:p]).reshape(p), ("d",))


def _apply_local(ainv_rows: jax.Array, b: jax.Array) -> jax.Array:
    x_loc = jnp.matmul(
        ainv_rows,
        b.astype(ainv_rows.dtype),
        preferred_element_type=ainv_rows.dtype,
        precision=matmul_precision(),
    )
    # explicit all_gather: the query answer is replicated for the caller
    # (and gives the projection model a concrete collective to count)
    g = jax.lax.all_gather(x_loc, "d")  # (P, n/P, nrhs)
    return g.reshape(-1, x_loc.shape[-1])


def sharded_apply(mesh: Mesh):
    """The jittable SPMD apply for ``mesh``: (row-sharded A⁻¹, replicated
    B) → replicated X. Exposed separately so tests can lower it and pin
    the all-gather volume in the compiled HLO."""
    return jax.shard_map(
        _apply_local,
        mesh=mesh,
        in_specs=(P("d", None), P(None, None)),
        out_specs=P(None, None),
        check_vma=False,
    )


def solve_inverse_sharded(
    ainv: jax.Array, b: jax.Array, mesh: Mesh
) -> jax.Array:
    """X = A⁻¹·B with A⁻¹ row-sharded over ``mesh`` axis 'd' and B
    replicated; returns the replicated (n, nrhs) answer. A⁻¹ comes from
    :func:`dla_tpu.algos.potri` (computed once, then resident sharded).
    """
    n = ainv.shape[-1]
    p = mesh.devices.size
    if n % p:
        raise ValueError(f"n={n} not divisible by mesh size {p}")
    ainv = jax.device_put(ainv, NamedSharding(mesh, P("d", None)))
    return sharded_apply(mesh)(ainv, b)


# Measured single-chip inverse-path serving rates (GF/s at the LAPACK
# 2·N²·NRHS convention) — v5e, N=16384, results_r3/solve_latency_probe
# .jsonl. HBM-stream-bound at narrow widths, MXU-bound at wide; linear
# interpolation in log2(nrhs), saturating at the ends.
SERVING_RATE_GFLOPS = {1: 169.9, 128: 22585.0, 1024: 52232.0}


def serving_rate(nrhs: int, chip: str = "v5e") -> float:
    """Measured-curve serving rate (GF/s) at RHS width nrhs."""
    from dla_tpu.parallel.model import CHIPS

    pts = sorted(SERVING_RATE_GFLOPS.items())
    scale = CHIPS[chip].tflops["high"] / CHIPS["v5e"].tflops["high"]
    if nrhs <= pts[0][0]:
        r = pts[0][1]
    elif nrhs >= pts[-1][0]:
        r = pts[-1][1]
    else:
        lx = math.log2(nrhs)
        for (n0, r0), (n1, r1) in zip(pts, pts[1:]):
            if n0 <= nrhs <= n1:
                t = (lx - math.log2(n0)) / (math.log2(n1) - math.log2(n0))
                r = r0 + (r1 - r0) * t
                break
    return r * scale


def serving_comm_elems(n: int, nrhs: int, p: int) -> int:
    """Per-query all-gather wire volume in elements: each device sends its
    (n/p, nrhs) slab to the other p-1 — (p-1)/p·n·nrhs on the busiest
    link direction (ring all-gather)."""
    return (p - 1) * n // p * nrhs


def project_serving(
    n: int,
    nrhs: int,
    p: int,
    *,
    chip: str = "v5e",
    itemsize: int = 4,
) -> dict:
    """Projected per-query latency / throughput of the sharded inverse
    apply on a p-device mesh vs one chip.

    The single-chip time comes from the *measured* serving-rate curve;
    it is decomposed into a **scalable** part — max(A⁻¹ HBM stream,
    MXU flop time), both of which row-sharding divides exactly p ways —
    and a **fixed** part (dispatch, B/X traffic, sub-ceiling GEMM
    inefficiency) that is conservatively NOT divided. Comm is the
    all-gather volume (pinned to the compiled HLO in
    tests/test_model.py) at the chip's ICI spec. Row-sharding also
    divides A⁻¹'s n²·itemsize across devices — the mesh unlocks sizes
    where one chip cannot even hold A⁻¹ (f32 N=65536 = 17.2 GiB > one
    v5e's 15.75; ≥2 devices hold it).
    """
    from dla_tpu.parallel.model import CHIPS

    spec = CHIPS[chip]
    rate = serving_rate(nrhs, chip) * 1e9
    bw = spec.ici_gbps * 1e9 * spec.link_efficiency
    lat = spec.latency_us * 1e-6
    flops = 2.0 * n * n * nrhs
    t_single = flops / rate
    # scalable: the larger of streaming A⁻¹ once and running the GEMM at
    # the tier's MXU ceiling; fixed: everything the measurement carries
    # beyond that (never negative — wide blocks can measure at ~the
    # ceiling, where the stream is hidden under the MXU time)
    t_stream = n * n * itemsize / (spec.hbm_gbps * 1e9)
    t_mxu = flops / (spec.tflops["high"] * 1e12)
    t_scalable = max(t_stream, t_mxu)
    t_fixed = max(0.0, t_single - t_scalable)
    t_comm = serving_comm_elems(n, nrhs, p) * itemsize / bw + lat
    t_dist = t_scalable / p + t_fixed + t_comm
    ainv_gib = n * n * itemsize / 2**30
    return {
        "n": n, "nrhs": nrhs, "p": p, "chip": chip,
        "t_single_s": t_single, "t_dist_s": t_dist,
        "t_comm_s": t_comm,
        "speedup": t_single / t_dist,
        "efficiency": t_single / t_dist / p,
        "queries_per_s": 1.0 / t_dist,
        "cols_per_s": nrhs / t_dist,
        "comm_fraction": t_comm / t_dist,
        "ainv_gib": ainv_gib,
        "single_chip_holds_ainv": ainv_gib <= spec.hbm_gib,
        "mesh_holds_ainv": ainv_gib / p <= spec.hbm_gib,
    }
