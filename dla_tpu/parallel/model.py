"""Analytic compute/comm scaling model for the distributed POTRF.

Answers the reference's characterization question — *when does scaling
out pay?* — for hardware this environment does not have. The reference
answered its analogue empirically: hybrid CPU+GPU beats CPU-only at
N ≥ ~12000 (SURVEY §6, from the ``benchmark.c`` sweeps behind
``results/bench.csv``). Here the analogous question is single-chip vs
multi-chip over an ICI mesh; with one physical chip, the answer is a
*model*:

- **compute** comes from :func:`~dla_tpu.parallel.potrf_dist.flop_accounting`
  (the per-step executed-flop geometry of the shipping ``_potrf_local``,
  already gated ≤1.2× ideal in tests) divided over devices at the
  *measured* per-tier single-chip GEMM ceilings (``docs/STATUS_r2.md``:
  chained-GEMM probe, RTT-corrected). The unrolled geometry is also
  representative of the nt>64 super-stepped path since the ROADMAP-#5
  staircase body: ``flop_accounting_super`` at the default segment
  sizing is ~1.08-1.11× ideal (gated ≤1.5×), within a few percent of
  the unrolled 1.2× gate;
- **comm** comes from the same accounting's per-step collective volumes
  (psum over 'c' + all_gather over 'r' of the windowed panel), which are
  validated against the **compiled HLO's actual collective operands** on a
  virtual mesh in ``tests/test_model.py`` — the model's comm term is tied
  to the real program, not to intent;
- **overlap**: the implementation software-pipelines one step of lookahead
  (panel k+1's collectives run under trailing k's GEMMs —
  ``potrf_dist.py:184``), so a step costs
  ``chol + solve + max(trailing, comm)``.

Link/bandwidth assumptions are explicit per chip generation (public spec
numbers; the v5e compute ceilings are *measured on this chip*, v5p scales
them by the public peak ratio). The model is a projection, not a
measurement — its validated parts are the flop geometry and the comm
volumes; its assumptions (link efficiency, latency) are named constants a
user can override.
"""

from __future__ import annotations

import dataclasses
import math

from dla_tpu.parallel.block_cyclic import BlockCyclicLayout
from dla_tpu.parallel.potrf_dist import flop_accounting


@dataclasses.dataclass(frozen=True)
class ChipSpec:
    """Per-chip model parameters.

    tflops: sustained large-GEMM throughput per precision tier (TF/s).
    ici_gbps: aggregate ICI bandwidth per chip, GB/s, one direction
      (v5e: 4 links ≈ 1600 Gbit/s ≈ 200 GB/s; v5p: 6 links ≈ 4800 Gbit/s
      ≈ 600 GB/s — public spec-sheet numbers).
    link_efficiency: achievable fraction of spec bandwidth (collectives
      rarely exceed ~70-80% of line rate).
    latency_us: per-collective launch+hop latency.
    hbm_gib: usable HBM per chip — bounds the largest single-chip N.
    hbm_gbps: HBM stream bandwidth (public spec: v5e 819, v5p 2765 GB/s)
      — rates the bandwidth-bound serving regime (parallel/serving.py).
    """

    tflops: dict
    ici_gbps: float
    link_efficiency: float
    latency_us: float
    hbm_gib: float
    hbm_gbps: float = 819.0


# v5e compute ceilings are MEASURED on this chip (STATUS_r2 chained-GEMM
# probe). v5p compute scales by the public bf16 peak ratio 459/197 ≈ 2.33;
# its ICI is the public 4800 Gbit/s figure.
CHIPS = {
    "v5e": ChipSpec(
        tflops={"default": 182.0, "high": 63.0, "highest": 31.4},
        ici_gbps=200.0, link_efficiency=0.75, latency_us=2.0, hbm_gib=15.75,
    ),
    "v5p": ChipSpec(
        tflops={"default": 424.0, "high": 147.0, "highest": 73.2},
        ici_gbps=600.0, link_efficiency=0.75, latency_us=2.0, hbm_gib=95.0,
        hbm_gbps=2765.0,
    ),
}

# Measured single-chip end-to-end POTRF rates at the `high` tier, raw
# per-invocation convention (best config per N) — the single-chip side of
# the crossover. Interpolated linearly in N; saturates at the last entry.
# Late-r3 refresh: full-K (kb=1024) inplace campaign medians
# (results_r3/sweep_kb.csv, NB=1024 high rows) through the fp32 in-core
# frontier N=57344 (probe median, results_r3/probe_frontier_n57344_high
# .log) — the distributed comparison is against the *best* single-chip
# formulation at each N, not last round's.
SINGLE_CHIP_HIGH_GFLOPS = {
    4096: 925.0,   # small-N regime (panel-solve dominated)
    8192: 6076.0,
    12288: 15712.0,
    16384: 25790.0,
    20480: 33760.0,
    24576: 40885.0,
    28672: 45905.0,
    32768: 49437.0,
    40960: 53780.0,
    49152: 56519.0,
    57344: 58023.0,
    61440: 58489.0,  # the fp32 in-core limit (15.06 GiB), probe raw median
}


def single_chip_rate(n: int, chip: str = "v5e", tier: str = "high") -> float:
    """Projected single-chip POTRF GF/s at size n (measured curve on v5e,
    scaled by the chip's tier ceiling ratio elsewhere)."""
    pts = sorted(SINGLE_CHIP_HIGH_GFLOPS.items())
    scale = (CHIPS[chip].tflops[tier] / CHIPS["v5e"].tflops["high"])
    if n <= pts[0][0]:
        r = pts[0][1] * n / pts[0][0]
    elif n >= pts[-1][0]:
        r = pts[-1][1]
    else:
        for (n0, r0), (n1, r1) in zip(pts, pts[1:]):
            if n0 <= n <= n1:
                r = r0 + (r1 - r0) * (n - n0) / (n1 - n0)
                break
    return r * scale


def step_comm_elems(layout: BlockCyclicLayout, k: int) -> int:
    """Panel-broadcast volume of step k in elements — mirrors
    ``flop_accounting``'s aggregate ``(ltr-w0)·nb²·(q+p)`` term."""
    w0 = (k + 1) // layout.p
    return (layout.ltr - w0) * layout.nb * layout.nb * (layout.q + layout.p)


def project(
    layout: BlockCyclicLayout,
    *,
    chip: str = "v5e",
    tier: str = "high",
    itemsize: int = 4,
) -> dict:
    """Projected wall time of the distributed POTRF on a p×q mesh.

    Per step k (geometry from ``flop_accounting(per_step=True)``):

    - serial phase: diag factor (one device, the others wait on the psum)
      + the panel solve on the kc column's p devices (each holds 1/p of
      the window) — the accounting's p-duplicated totals divided back per
      device;
    - overlapped phase: ``max(trailing/(p·q·R_dev), comm_k)`` — the 1-step
      lookahead hides the smaller of the two;
    - ``comm_k`` = step volume · itemsize / (ici_bw · link_eff) +
      2 collectives · latency.

    Both sides of the comparison use the same measured size-dependent
    rate curve: the per-device rate is the *measured single-chip
    end-to-end rate at the device-local scale* N/√(p·q) (each device
    holds N²/(p·q) elements), so the small-GEMM/panel-overhead penalty
    that the measured curve embodies applies to the distributed side too —
    without this, tiny-N projections absurdly credit each device with
    full-size GEMM efficiency.

    Returns totals plus the single-chip projection, speedup, and parallel
    efficiency (speedup / device count).
    """
    spec = CHIPS[chip]
    acc = flop_accounting(layout, per_step=True)
    n_local = max(1, int(layout.n / math.sqrt(layout.p * layout.q)))
    rate = single_chip_rate(n_local, chip, tier) * 1e9
    bw = spec.ici_gbps * 1e9 * spec.link_efficiency
    lat = spec.latency_us * 1e-6
    t_serial = t_overlap = t_comm_total = 0.0
    for s in acc["steps"]:
        k = s["k"]
        # accounting duplicates chol on the column's p devices (p·nb³/3) and
        # counts the column-total solve p times; per-device critical path:
        t_chol = (s["chol"] / layout.p) / rate
        t_solve = (s["solve"] / layout.p / layout.p) / rate
        t_trail = s["trail"] / (layout.p * layout.q) / rate
        comm_bytes = step_comm_elems(layout, k) * itemsize
        t_comm = comm_bytes / bw + 2 * lat
        t_serial += t_chol + t_solve
        t_overlap += max(t_trail, t_comm)
        t_comm_total += t_comm
    total = t_serial + t_overlap
    n = layout.n
    ideal_flops = n**3 / 3
    t_single = ideal_flops / (single_chip_rate(n, chip, tier) * 1e9)
    hbm_elems = spec.hbm_gib * 2**30 / itemsize
    # shrink path peak ≈ 2·N² buffers (STATUS_r2); in-core bound:
    n_max_single = int(math.sqrt(hbm_elems / 2))
    return {
        "n": n, "p": layout.p, "q": layout.q, "nb": layout.nb,
        "chip": chip, "tier": tier,
        "t_dist_s": total, "t_serial_s": t_serial, "t_overlap_s": t_overlap,
        "t_comm_s": t_comm_total,
        "dist_gflops": ideal_flops / total / 1e9,
        "t_single_s": t_single,
        "single_gflops": ideal_flops / t_single / 1e9,
        "speedup": t_single / total,
        "efficiency": t_single / total / (layout.p * layout.q),
        "single_chip_fits": n <= n_max_single,
        "n_max_single": n_max_single,
        "comm_fraction": t_comm_total / total,
        "flop_ratio": acc["ratio"],
    }


def crossover_n(
    p: int,
    q: int,
    *,
    chip: str = "v5e",
    tier: str = "high",
    nb: int = 2048,
    n_max: int = 262144,
) -> dict:
    """Smallest N (multiple of nb·lcm(p,q)) where the p×q mesh beats one
    chip, plus the projection at that N and at the single-chip HBM bound."""
    stride = nb * (p * q // math.gcd(p, q))
    first = eff50 = eff70 = None
    rows = []
    for n in range(stride, n_max + 1, stride):
        lay = BlockCyclicLayout(n=n, nb=nb, p=p, q=q)
        r = project(lay, chip=chip, tier=tier)
        rows.append(r)
        if first is None and r["speedup"] > 1.0:
            first = r
        if eff50 is None and r["efficiency"] >= 0.5:
            eff50 = n
        if eff70 is None and r["efficiency"] >= 0.7:
            eff70 = n
    return {
        "mesh": f"{p}x{q}", "chip": chip, "tier": tier, "nb": nb,
        "crossover_n": first["n"] if first else None,
        # the more decision-relevant thresholds: smallest N with ≥50%/70%
        # parallel efficiency (speedup alone crosses 1 early but poorly)
        "n_eff50": eff50,
        "n_eff70": eff70,
        "at_crossover": first,
        "curve": rows,
    }


# ---------------------------------------------------------------------------
# Out-of-core projection (BASELINE config 5: N ≫ device/host RAM)
# ---------------------------------------------------------------------------
#
# The reference's whole distributed design exists to serve N ≫ worker RAM
# (client holds the matrix, workers hold O(B²) —
# cholesky_armonik/.../client_distrib.cpp:280-309). The rebuild's analogue
# is `algos/oocore.py`: a left-looking panel stream over a disk/host store.
# This model projects that pipeline (a) on this VM's measured single-host
# rates — validated against the completed N=163840 run — and (b) onto a
# TPU mesh with PCIe-class staging, answering what config-5 (N=262144)
# costs and which side (staging bandwidth vs compute) binds.
#
# Volume geometry of the left-looking algorithm with panel width B
# (exact sums over panels, not the continuum approximations):
#   stream-in  = Σ_j (N − jB)·(jB)        elements  (≈ N³/6B)
#   compute    = N³/3 + O(N²B)            flops
#   writeback  = Σ_j (N − jB)·B           elements  (≈ N²/2)

@dataclasses.dataclass(frozen=True)
class OocoreHostCalib:
    """Measured single-host rates (this VM, N=163840 run,
    benchmarks/results_r3/oocore_n163840.log).

    gemm_gflops: resident in-place OpenBLAS sgemm rate (microbenchmark,
      docs/STATUS_r3.md) — the pure-compute term.
    overhead: fitted end-to-end factor over the pure-GEMM time covering
      panel factor/solve flops, the balloon-throttled page supply, and
      prefetch contention on the single core (measured compute-phase time
      ÷ modeled GEMM time at N=163840).
    pack_gibps / writeback_gibps: measured staging pack and O_DIRECT
      writeback rates (the run's own `[oocore] staging:` line).
    """

    gemm_gflops: float = 120.0
    overhead: float = 1.41
    pack_gibps: float = 0.22
    writeback_gibps: float = 0.14


def oocore_volumes(n: int, panel: int, itemsize: int = 4) -> dict:
    """Exact stream/compute/writeback volumes of the left-looking loop.

    stream = the k-panel updates (h·jB per panel) **plus the panel's own
    one-time read** (h·B) — together these reproduce the run log's
    staged-in volume exactly (717.50 GiB at N=163840/panel=4096)."""
    nt = -(-n // panel)
    stream_elems = sum(
        (n - j * panel) * (j * panel + panel) for j in range(nt)
    )
    wb_elems = sum((n - j * panel) * panel for j in range(nt))
    return {
        "n": n, "panel": panel, "npanels": nt,
        "stream_bytes": stream_elems * itemsize,
        "writeback_bytes": wb_elems * itemsize,
        "flops": n**3 / 3,
    }


def project_oocore_host(
    n: int,
    panel: int = 4096,
    *,
    calib: OocoreHostCalib = OocoreHostCalib(),
    itemsize: int = 4,
) -> dict:
    """Projected end-to-end seconds for the single-host CPU-backend
    out-of-core factorization on this VM (validated: within a few % of
    the measured N=163840 total — tests/test_model.py)."""
    v = oocore_volumes(n, panel, itemsize)
    gib = 2.0**30
    t_compute = v["flops"] / (calib.gemm_gflops * 1e9) * calib.overhead
    t_pack = v["stream_bytes"] / gib / calib.pack_gibps
    t_wb = v["writeback_bytes"] / gib / calib.writeback_gibps
    total = t_compute + t_pack + t_wb
    return {
        **v,
        "t_compute_s": t_compute, "t_pack_s": t_pack, "t_writeback_s": t_wb,
        "t_total_s": total,
        "gflops": v["flops"] / total / 1e9,
    }


def project_oocore_mesh(
    n: int,
    panel: int = 8192,
    p: int = 2,
    q: int = 4,
    *,
    chip: str = "v5e",
    tier: str = "high",
    host_bw_gbps: float = 32.0,
    compute_eff: float = 0.85,
    itemsize: int = 4,
) -> dict:
    """Project config-5-scale out-of-core POTRF on a p×q TPU mesh with
    host staging at ``host_bw_gbps`` (PCIe-class; NOT this VM's 46 MB/s
    tunnel — that number makes the TPU path infeasible, docs/ROADMAP.md).

    Per panel j the stream (in + writeback) overlaps the update GEMMs
    (double-buffered prefetch, `algos/oocore.py`); the panel factor+solve
    is serial. compute_eff is the measured trailing-kernel utilization
    fraction (xprof, STATUS_r3: ~89% — default slightly conservative).

    Returns the end-to-end projection plus which side binds and the
    minimum staging bandwidth for compute-bound operation.
    """
    spec = CHIPS[chip]
    rate = spec.tflops[tier] * 1e12 * compute_eff * p * q
    bw = host_bw_gbps * 1e9
    t_total = t_stream = t_compute = t_serial = 0.0
    nt = -(-n // panel)
    for j in range(nt):
        h = n - j * panel
        io_bytes = (h * (j * panel) + h * panel) * itemsize  # in + wb
        t_io = io_bytes / bw
        t_upd = 2.0 * h * panel * (j * panel) / rate
        # panel factor+solve: B³/3 on one column + h·B² solve flops
        t_fac = (panel**3 / 3 + h * panel**2) / rate
        t_total += max(t_io, t_upd) + t_fac
        t_stream += t_io
        t_compute += t_upd
        t_serial += t_fac
    flops = n**3 / 3
    # staging bandwidth at which Σ io time == Σ update time:
    # bw' = io_bytes / t_compute = (t_stream · bw) / t_compute
    min_bw_gbps = (
        bw * t_stream / t_compute / 1e9 if t_compute else float("inf")
    )
    hbm = spec.hbm_gib * 2**30
    panel_max = int(hbm / (2.5 * n * itemsize))  # ~2 panels + slack resident
    return {
        "n": n, "panel": panel, "mesh": f"{p}x{q}", "chip": chip,
        "tier": tier, "host_bw_gbps": host_bw_gbps,
        "t_total_s": t_total,
        "gflops": flops / t_total / 1e9,
        "stream_fraction": t_stream / (t_stream + t_compute + t_serial),
        "bound": "stream" if t_stream > t_compute else "compute",
        "min_bw_gbps_compute_bound": min_bw_gbps,
        "panel_max_by_hbm": panel_max,
        "panel_fits_hbm": panel <= panel_max,
    }
