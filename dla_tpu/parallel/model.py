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

from dla_tpu.kernels.collectives import broadcast_chunks
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
    # ICI link count per chip: the flat-ring data plane
    # (kernels/collectives.ring_broadcast) streams over ONE neighbor link
    # per hop, so its bandwidth is ici_gbps / ici_links, not the aggregate
    # (v5e: 4 links; v5p: 6 — public spec sheets).
    ici_links: int = 4


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
        hbm_gbps=2765.0, ici_links=6,
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

# Measured single-chip curves for the HBM-bound tiers (campaign best-config
# medians per N over sweep.csv + sweep_kb.csv, raw per-invocation
# convention, best formulation per N — dense `inplace` up to its in-core
# limit, `packed` beyond: the packed rows at N ≥ 65536 f32 / 98304 bf16
# are the session-10/11 triangle-only frontier, docs/STATUS_r3.md).
SINGLE_CHIP_DEFAULT_GFLOPS = {
    4096: 960.0,
    8192: 6763.0,
    12288: 17898.0,
    16384: 33889.0,
    20480: 41201.0,
    24576: 63913.0,
    28672: 63003.0,
    32768: 95521.0,
    40960: 101371.0,
    49152: 129354.0,
    57344: 140019.0,
    65536: 147972.0,  # packed (dense f32 no longer fits)
    73728: 153450.0,
    81920: 154338.0,  # packed f32 compile frontier
}

SINGLE_CHIP_BF16_GFLOPS = {
    8192: 6781.0,
    12288: 18774.0,
    16384: 36013.0,
    20480: 49507.0,
    24576: 64799.0,
    28672: 75479.0,
    32768: 107084.0,
    40960: 98549.0,
    49152: 140074.0,
    65536: 156466.0,
    98304: 171147.0,   # packed
    106496: 172036.0,  # packed bf16 compile frontier
}

# tier name → (measured v5e curve, ChipSpec.tflops ceiling key used to
# scale the curve to other chips). "bf16" is the bf16-storage policy —
# its MXU mode is the 1-pass default ceiling (ROADMAP negative result:
# bf16 × high is compiler-rejected).
# Measured single-chip emulated-fp64 (df64, s=7) curve — LOGICAL N^3/3
# flops (the executed bf16 MXU passes are s(s+1)/2 = 28x that), raw
# per-invocation medians from benchmarks/results_r4/df64_probe.jsonl
# (+ r5 record certs): pallas-trailing dense to 32768, packed beyond.
# This is the 1e-10-contract rate the df64 mesh projection charges.
SINGLE_CHIP_DF64_GFLOPS = {
    4096: 477.0,
    8192: 1713.0,
    16384: 3180.0,
    24576: 3906.0,   # r5 bench f64x tier (v6-exact gate 4.19e-11)
    32768: 4315.0,   # r5 dense frontier (v6-exact gate 4.43e-11)
    40960: 4628.0,   # r5 packed, Freivalds 7.21e-14
    46080: 4755.0,   # r5 packed record (compile wall sits at 48128)
}

# tier name → (measured v5e curve, ChipSpec.tflops ceiling key used to
# scale the curve to other chips). "bf16" is the bf16-storage policy —
# its MXU mode is the 1-pass default ceiling (ROADMAP negative result:
# bf16 × high is compiler-rejected). "f64x" scales by the same 1-pass
# bf16 ceiling: every df64 flop is a fixed number of bf16 MXU passes.
SINGLE_CHIP_CURVES = {
    "high": (SINGLE_CHIP_HIGH_GFLOPS, "high"),
    "default": (SINGLE_CHIP_DEFAULT_GFLOPS, "default"),
    "bf16": (SINGLE_CHIP_BF16_GFLOPS, "default"),
    "f64x": (SINGLE_CHIP_DF64_GFLOPS, "default"),
}


def single_chip_rate(n: int, chip: str = "v5e", tier: str = "high") -> float:
    """Projected single-chip POTRF GF/s at size n (measured curve on v5e,
    scaled by the chip's tier ceiling ratio elsewhere)."""
    # tiers without a measured curve (e.g. "highest") scale the high curve
    # by the ceiling ratio, as the pre-packed model did
    curve, ceil_key = SINGLE_CHIP_CURVES.get(
        tier, (SINGLE_CHIP_HIGH_GFLOPS, "high"))
    pts = sorted(curve.items())
    if tier in SINGLE_CHIP_CURVES:
        scale = CHIPS[chip].tflops[ceil_key] / CHIPS["v5e"].tflops[ceil_key]
    else:
        scale = CHIPS[chip].tflops[tier] / CHIPS["v5e"].tflops["high"]
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


@dataclasses.dataclass(frozen=True)
class OocoreComboCalib:
    """Measured rates for the DISTRIBUTED out-of-core path on this VM's
    8-virtual-device CPU mesh (the r4 combo artifact,
    ``benchmarks/results_r4/oocore_combo_n49152_v2.log``; VERDICT r3 #4).

    gemm_gflops: XLA-CPU sharded update-GEMM rate, measured by an
      independent micro of the actual jitted update program on the 2x4
      virtual mesh (single host core — the virtual mesh buys memory
      geometry, not parallel compute).
    overhead: end-to-end factor over the pure-GEMM time (panel
      factor+solve with collectives, dispatch, python) — fitted on the
      N=16384 combo smoke, then validated cross-size on the N=49152 run
      (tests/test_model.py).
    pack_gibps / writeback_gibps: the run's own staging lines (writeback
      is the r4 fixed path: per-shard zero-copy views into a persistent
      pre-faulted buffer — the first-cut np.asarray(sharded) path ran at
      the balloon's ~5 MB/s fresh-page rate and was 55% of wall).
    """

    gemm_gflops: float = 70.0
    overhead: float = 1.235
    panel_fixed_s: float = 10.8
    pack_gibps: float = 0.55
    writeback_gibps: float = 0.13


def project_oocore_combo(
    n: int,
    panel: int = 4096,
    *,
    calib: OocoreComboCalib = OocoreComboCalib(),
    itemsize: int = 4,
) -> dict:
    """Projected end-to-end seconds for the distributed (virtual-mesh)
    out-of-core combo on this VM — the measured-run pin for the
    config-5-shaped pipeline (disk panel store × sharded update GEMMs).
    Same volume geometry as :func:`project_oocore_host`; compute is a
    2-term law: GEMM flops at the measured sharded-update rate ×
    ``overhead`` (collective/dispatch inefficiency) + a per-panel fixed
    cost (sharded factor+solve, per-shape jit compile, python) fitted on
    the N∈{16384, 24576} combo runs and validated cross-size on fresh
    N∈{32768, 49152} runs (tests/test_model.py)."""
    v = oocore_volumes(n, panel, itemsize)
    gib = 2.0**30
    t_compute = (v["flops"] / (calib.gemm_gflops * 1e9) * calib.overhead
                 + v["npanels"] * calib.panel_fixed_s)
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


# ---------------------------------------------------------------------------
# Packed column-cyclic projection (ROADMAP r4 candidate 2b, model half)
# ---------------------------------------------------------------------------
#
# `parallel/packed_cyclic.py` combines triangle-only packed storage with the
# flat-mesh column-cyclic distribution (Pallas ring data plane). Per-device
# resident memory is ≈ n²/(2·D) + n·nb/2 (`packed_cyclic.resident_elems`),
# so a D-chip mesh holds a √2× larger in-core N than the dense
# column-cyclic path ON TOP of the packed single-chip gain — and the
# packed formulation is also the fastest at the HBM-bound tiers
# (session 11: f32 154.5 / bf16 172.2 TF/s single-chip). This model
# projects that combination onto meshes this environment does not have,
# the same way `project` does for the PxQ dense path:
#
# - the flop accounting below mirrors `_potrf_local_packed`'s loop
#   EXACTLY (SPMD-executed convention: masked lanes still execute — every
#   device runs identical shapes);
# - the comm term counts the two per-step `ring_broadcast` operands, and
#   is pinned to the real program in tests/test_packed_cyclic.py by
#   tracing the data plane with a recording stub;
# - the ring streams over ONE neighbor link per hop, so its bandwidth is
#   ici_gbps / ici_links (NOT the aggregate the XLA-collective model
#   uses); each broadcast is charged the EXACT time law of the
#   implemented chunk-pipelined kernel (kernels/collectives.py):
#   (C + D − 2)·(V/(C·link_bw) + lat) with C = broadcast_chunks(rows, D)
#   — imported from the kernel module, so the charged C is the C the data
#   plane actually uses. With C = 1 (buffers too small to split) this is
#   store-and-forward's (D − 1)·(V/link_bw + lat); latency is charged per
#   ACTUAL broadcast (the last step has no panel broadcast);
# - NO lookahead overlap is credited: unlike `_potrf_local` (1-step
#   pipelined, `potrf_dist.py:184`), the packed-cyclic program is
#   broadcast-then-update in program order — the model charges
#   t_fac + t_bcast + t_trail per step, honestly conservative.

def packed_cyclic_accounting(n: int, nb: int, ndev: int) -> dict:
    """Exact per-step executed flops and ring-broadcast element volumes of
    ``packed_cyclic._potrf_local_packed`` (same geometry helpers)."""
    nt = n // nb
    if n % nb or nt % ndev:
        raise ValueError("need nb | n and ndev | nt")
    ltc = nt // ndev
    hs = [(nt - lj * ndev) * nb for lj in range(ltc)]
    steps = []
    exec_total = 0.0
    for k in range(nt):
        ljk = k // ndev
        chol = nb**3 / 3.0
        solve_rows = hs[ljk] - nb
        solve = float(solve_rows) * nb * nb
        # two broadcasts: the nb×nb factor tile always; the solved panel
        # except after the last step
        bcast = nb * nb + (solve_rows * nb if k < nt - 1 else 0)
        # trailing: every device executes 2·hs[lj]·nb² for each slab group
        # lj that has ANY live column (lj·D + D−1 > k); dead lanes are
        # where-masked but still executed (SPMD)
        trail_dev = 0.0
        if k < nt - 1:
            for lj in range(ltc):
                if lj * ndev + ndev - 1 <= k:
                    continue
                trail_dev += 2.0 * hs[lj] * nb * nb
        steps.append({
            "k": k, "chol": chol, "solve": solve,
            "bcast_elems": bcast, "trail_per_dev": trail_dev,
            # the two ring broadcasts' row counts — the time law needs the
            # buffer geometry, not just the volume (chunk count is a
            # function of rows)
            "bcast_rows": (nb, solve_rows if k < nt - 1 else 0),
        })
        # exec_total is the CRITICAL-PATH convention for the factor/solve
        # terms (charged once — under shard_map the lax.cond(own, ...)
        # non-owners wait on the broadcast regardless, so duplicated
        # execution would not change wall time) and the SPMD-executed
        # convention for the trailing term (masked lanes still execute
        # identical shapes — ×ndev is real work).
        exec_total += chol + solve + trail_dev * ndev
    ideal = n**3 / 3.0
    return {
        "n": n, "nb": nb, "ndev": ndev, "steps": steps,
        "executed": exec_total, "ideal": ideal,
        "ratio": exec_total / ideal,
        "bcast_elems_total": sum(s["bcast_elems"] for s in steps),
    }


def packed_resident_bytes(n: int, nb: int, ndev: int,
                          itemsize: int = 4) -> int:
    """Per-device resident bytes of the packed column-cyclic layout
    (envelope-padded slabs — the exact `resident_elems` sum)."""
    nt = n // nb
    ltc = nt // ndev
    return sum((nt - lj * ndev) * nb for lj in range(ltc)) * nb * itemsize


def packed_mesh_max_n(
    ndev: int,
    *,
    chip: str = "v5e",
    nb: int = 4096,
    itemsize: int = 4,
    fill: float = 0.85,
) -> dict:
    """Largest in-core N (multiple of nb·ndev) on a D-chip flat mesh for
    the packed column-cyclic layout vs the dense column-cyclic one.

    ``fill`` reserves headroom for the broadcast panel + program
    temporaries; fill=0.85 reproduces the measured single-chip packed
    compile frontier (f32 81920 modeled ≈ 84k; bf16 106496 ≈ 119k —
    the bf16 gap is the remote-compile-helper crash, a host-side bound,
    docs/STATUS_r3.md session 10)."""
    budget = CHIPS[chip].hbm_gib * 2**30 * fill
    n = nb * ndev
    best_packed = best_dense = 0
    while True:
        if packed_resident_bytes(n, nb, ndev, itemsize) <= budget:
            best_packed = n
        else:
            break
        n += nb * ndev
    n = nb * ndev
    while True:
        dense = (n // ndev) * n * itemsize  # full local columns
        if dense <= budget:
            best_dense = n
        else:
            break
        n += nb * ndev
    return {
        "ndev": ndev, "chip": chip, "nb": nb, "itemsize": itemsize,
        "fill": fill, "max_n_packed": best_packed, "max_n_dense": best_dense,
        "unlock_ratio": best_packed / best_dense if best_dense else None,
    }


def project_packed_cyclic(
    n: int,
    nb: int,
    ndev: int,
    *,
    chip: str = "v5e",
    tier: str = "default",
    itemsize: int = 4,
    planes: int = 1,
) -> dict:
    """Projected wall time of the packed column-cyclic POTRF on a flat
    D-device mesh (see the section comment for the term-by-term model).

    The single-chip comparison side uses the same measured tier curve;
    ``single_chip_fits`` reports whether N is in-core for the *packed*
    single-chip layout (n·(n+nb)/2 elements) — beyond it the mesh is the
    only in-core option and ``speedup`` compares against the saturated
    curve rate, which flatters the (infeasible) single chip."""
    spec = CHIPS[chip]
    acc = packed_cyclic_accounting(n, nb, ndev)
    n_local = max(1, int(n / math.sqrt(ndev)))
    rate = single_chip_rate(n_local, chip, tier) * 1e9
    link_bw = spec.ici_gbps / spec.ici_links * 1e9 * spec.link_efficiency
    lat = spec.latency_us * 1e-6

    def t_bcast(rows: int) -> float:
        # the implemented chunk-pipelined ring kernel's exact time law
        # (kernels/collectives.py): C+D−2 hops of one chunk each. The
        # df64 plane (planes=2) stacks (hi, lo) into ONE buffer per
        # broadcast, so the kernel sees planes·rows buffer rows.
        if ndev <= 1 or rows == 0:
            return 0.0
        c = broadcast_chunks(planes * rows, ndev)
        return (c + ndev - 2) * (
            planes * rows * nb * itemsize / (c * link_bw) + lat)

    t_fac = t_comm = t_trail = 0.0
    for s in acc["steps"]:
        t_fac += (s["chol"] + s["solve"]) / rate
        tile_rows, panel_rows = s["bcast_rows"]
        t_comm += t_bcast(tile_rows) + t_bcast(panel_rows)
        t_trail += s["trail_per_dev"] / rate
    total = t_fac + t_comm + t_trail
    ideal = n**3 / 3.0
    t_single = ideal / (single_chip_rate(n, chip, tier) * 1e9)
    hbm = spec.hbm_gib * 2**30
    single_fits = planes * n * (n + nb) / 2 * itemsize <= hbm * 0.85
    return {
        "n": n, "nb": nb, "ndev": ndev, "chip": chip, "tier": tier,
        "t_dist_s": total, "t_fac_s": t_fac, "t_comm_s": t_comm,
        "t_trail_s": t_trail,
        "dist_gflops": ideal / total / 1e9,
        "t_single_s": t_single,
        "single_gflops": ideal / t_single / 1e9,
        "speedup": t_single / total,
        "efficiency": t_single / total / ndev,
        "comm_fraction": t_comm / total,
        "flop_ratio": acc["ratio"],
        "single_chip_fits": single_fits,
        "resident_bytes_per_dev": planes * packed_resident_bytes(
            n, nb, ndev, itemsize),
        "planes": planes,
    }


def packed_crossover(
    ndev: int,
    *,
    chip: str = "v5e",
    tier: str = "default",
    nb: int = 4096,
    itemsize: int = 4,
    planes: int = 1,
) -> dict:
    """Scan N (multiples of nb·ndev) up to the mesh's packed in-core bound:
    smallest N where the flat mesh beats one chip, the ≥50%/70% efficiency
    thresholds, and the projection at the bound (the memory-unlock point —
    the largest factorization the mesh can hold at all)."""
    bound = packed_mesh_max_n(
        ndev, chip=chip, nb=nb, itemsize=itemsize * planes)["max_n_packed"]
    first = eff50 = eff70 = None
    rows = []
    for n in range(nb * ndev, bound + 1, nb * ndev):
        r = project_packed_cyclic(
            n, nb, ndev, chip=chip, tier=tier, itemsize=itemsize,
            planes=planes)
        rows.append(r)
        if first is None and r["speedup"] > 1.0:
            first = r
        if eff50 is None and r["efficiency"] >= 0.5:
            eff50 = n
        if eff70 is None and r["efficiency"] >= 0.7:
            eff70 = n
    return {
        "ndev": ndev, "chip": chip, "tier": tier, "nb": nb,
        "planes": planes, "mesh_max_n": bound,
        "crossover_n": first["n"] if first else None,
        "n_eff50": eff50, "n_eff70": eff70,
        "at_mesh_max": rows[-1] if rows else None,
        "curve": rows,
    }
