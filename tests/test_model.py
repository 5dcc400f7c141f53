"""Gates for the multi-chip scaling model (`parallel/model.py`) and the
super-step flop accounting (VERDICT r2 weak #6 / next-round #4).

The model's comm term is validated against the *compiled HLO* of the real
distributed program on the virtual mesh: the per-step collective operand
volumes the accounting claims must match what XLA actually emits.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dla_tpu.parallel import BlockCyclicLayout, make_mesh
from dla_tpu.parallel.model import (
    CHIPS,
    crossover_n,
    project,
    single_chip_rate,
    step_comm_elems,
)
from dla_tpu.parallel.potrf_dist import (
    _potrf_jit,
    flop_accounting,
    flop_accounting_super,
)


def _collectives(hlo: str):
    """Yield (op, result_elems, group_len) for each collective instruction.

    Compiled HLO lines look like
      %ag.43 = f64[2,64,16]{2,1,0} all-gather(%bitcast), ...,
               replica_groups={{0,4},{1,5},...}, ...
    (result shape only; all-reduce operand == result, all-gather operand ==
    result / group_len).
    """
    pat = re.compile(
        r"= *[a-z0-9]+\[([0-9,]*)\]\S* (all-gather|all-reduce)\("
        r".*?replica_groups=\{\{([0-9,]+)\}"
    )
    for m in pat.finditer(hlo):
        elems = 1
        for d in m.group(1).split(","):
            if d:
                elems *= int(d)
        yield m.group(2), elems, len(m.group(3).split(","))


class TestCommVolumeVsHLO:
    def test_accounting_matches_compiled_collectives(self):
        """Σ all-gather operand elems and Σ all-reduce operand elems of the
        compiled unrolled program must equal the accounting's per-step
        window volumes (panel psum windows + the nb² diag psums)."""
        p, q, nb, nt = 2, 4, 16, 16
        layout = BlockCyclicLayout(n=nb * nt, nb=nb, p=p, q=q)
        mesh = make_mesh(p, q)
        x = jnp.zeros((layout.n, layout.n), jnp.float64)
        from dla_tpu.parallel.block_cyclic import from_dense

        xs = from_dense(np.eye(layout.n), layout, mesh)
        lowered = _potrf_jit.lower(xs, layout, mesh, True, 1)
        hlo = lowered.compile().as_text()

        ltr = layout.ltr
        # model: per step k one windowed panel psum (over the q-sized 'c'
        # groups) + one windowed all_gather (over the p-sized 'r' groups),
        # operands (ltr-w0)·nb × nb; plus one full-mesh nb² diag psum
        win_elems = sum(
            (ltr - (k + 1) // p) * nb * nb for k in range(nt)
        )
        diag_elems = nt * nb * nb
        ag = ar_panel = ar_diag = 0
        for op, elems, glen in _collectives(hlo):
            if op == "all-gather":
                assert glen == p
                ag += elems // glen  # operand = result / group
            elif glen == p * q:
                ar_diag += elems
            else:
                assert glen == q
                ar_panel += elems
        assert ag == win_elems, (ag, win_elems)
        assert ar_panel == win_elems, (ar_panel, win_elems)
        assert ar_diag == diag_elems, (ar_diag, diag_elems)
        # and the accounting's aggregate comm term is exactly these volumes
        # weighted by the participating axis sizes
        acc = flop_accounting(layout)
        assert acc["comm_elems"] == win_elems * (p + q)
        # step_comm_elems (the model's per-step term) sums to the same
        assert sum(step_comm_elems(layout, k) for k in range(nt)) == acc["comm_elems"]


class TestSuperAccounting:
    def test_ratio_monotone_in_super_steps(self):
        """Smaller segments shrink the masked-slack overhead; pure fori
        (one segment) is the worst case."""
        layout = BlockCyclicLayout(n=16 * 256, nb=16, p=2, q=4)
        nt = layout.ntiles
        r_small = flop_accounting_super(layout, 4)["ratio"]
        r_mid = flop_accounting_super(layout, 32)["ratio"]
        r_fori = flop_accounting_super(layout, nt)["ratio"]
        assert r_small < r_mid < r_fori
        # pure fori (one segment): the per-column static staircase caps
        # the trail term at the staircase area from a never-advancing
        # window base ⇒ ~3× ideal (was ~6× with the pre-ROADMAP-#5
        # full-window GEMM)
        assert 2.5 < r_fori < 3.5

    def test_default_sizing_bounded(self):
        """The auto segment sizing (≤32 segments — potrf_block_cyclic)
        must keep the fori variant's masked-flop overhead ≤1.5× ideal
        (measured ~1.08-1.11× at nt=128/256 on 2×4 after the ROADMAP-#5
        staircase/cond-gated body — it now beats the unrolled path's
        ≤1.2× gate)."""
        for nt in (128, 256):
            layout = BlockCyclicLayout(n=16 * nt, nb=16, p=2, q=4)
            ss = max(1, -(-nt // 32))
            r = flop_accounting_super(layout, ss)["ratio"]
            assert r < 1.5, (nt, ss, r)

    def test_super_counts_all_devices_unmasked(self):
        """Sanity: the fori geometry spends ≥ the unrolled geometry
        everywhere (no cond gating, full windows)."""
        layout = BlockCyclicLayout(n=16 * 64, nb=16, p=2, q=4)
        a = flop_accounting(layout)
        s = flop_accounting_super(layout, 8)
        for k in ("chol", "solve", "trail"):
            assert s[k] >= a[k], k


class TestProjections:
    def test_single_chip_rate_interp(self):
        # late-r3 frontier curve (full-K inplace campaign medians, raw
        # convention, through the fp32 in-core limit N=61440)
        assert single_chip_rate(32768) == pytest.approx(49437.0)
        assert single_chip_rate(26624) == pytest.approx(
            40885 + (45905 - 40885) * (26624 - 24576) / (28672 - 24576)
        )
        # saturates beyond the measured range (the in-core-limit rate)
        assert single_chip_rate(131072) == pytest.approx(58489.0)

    def test_projection_fields_sane(self):
        layout = BlockCyclicLayout(n=32768, nb=1024, p=2, q=4)
        r = project(layout)
        assert 0 < r["comm_fraction"] < 1
        assert r["t_dist_s"] > 0 and r["t_single_s"] > 0
        assert r["flop_ratio"] < 1.3  # nt=32 — the tested unrolled regime
        assert r["single_chip_fits"]  # 32768 fp32 fits a v5e

    def test_speedup_grows_with_n(self):
        meshes = (2, 4)
        rs = [
            project(BlockCyclicLayout(n=n, nb=2048, p=2, q=4))["speedup"]
            for n in (16384, 65536, 131072)
        ]
        assert rs[0] < rs[1] < rs[2]

    def test_crossover_exists_per_mesh(self):
        """Every mesh must show a finite crossover N on v5e at `high` —
        the model's analogue of the reference's 'hybrid pays at N≥12000'."""
        for p, q in ((2, 2), (2, 4), (4, 4)):
            out = crossover_n(p, q, nb=2048, n_max=131072)
            assert out["crossover_n"] is not None, (p, q)
            # larger meshes amortize later (more comm, same serial panel)
        c22 = crossover_n(2, 2, nb=2048, n_max=131072)["crossover_n"]
        c44 = crossover_n(4, 4, nb=2048, n_max=131072)["crossover_n"]
        assert c22 <= c44

    def test_v5p_spec_present(self):
        assert set(CHIPS) >= {"v5e", "v5p"}
        assert CHIPS["v5p"].ici_gbps > CHIPS["v5e"].ici_gbps


class TestProjectionsArtifact:
    def test_committed_artifact_matches_model(self):
        """benchmarks/results_r3/projections.json must equal what the
        model produces today (regenerate with benchmarks/projections_r3.py)
        — the published crossover table can't silently drift from the
        code that claims to justify it."""
        import json
        import os

        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "benchmarks", "results_r3", "projections.json",
        )
        with open(path) as f:
            rows = json.load(f)
        assert len(rows) == 6  # {v5e,v5p} x {2x2,2x4,4x4}
        for row in rows:
            p, q = (int(s) for s in row["mesh"].split("x"))
            r = crossover_n(p, q, chip=row["chip"])
            assert r["crossover_n"] == row["crossover_n"], row["mesh"]
            assert r["n_eff50"] == row["n_eff50"]
            assert r["n_eff70"] == row["n_eff70"]
            by_n = {c["n"]: c for c in r["curve"]}
            assert by_n[131072]["speedup"] == pytest.approx(
                row["speedup_at_131072"], abs=5e-4
            )
            assert by_n[131072]["comm_fraction"] == pytest.approx(
                row["comm_fraction_at_131072"], abs=5e-4
            )


class TestPackedCyclicModel:
    """Gates for the packed × multi-chip projection (ROADMAP r4 2b, model
    half). The comm term is pinned to the real data plane in
    tests/test_packed_cyclic.py::TestCommPinnedToDataPlane."""

    def test_accounting_overhead_amortizes(self):
        """Envelope padding + dead-lane execution shrink as nt/D grows —
        the SPMD-executed overhead is a small-grid artifact, not a tax on
        the memory-unlock regime."""
        from dla_tpu.parallel.model import packed_cyclic_accounting

        r = [
            packed_cyclic_accounting(n, 1024, 8)["ratio"]
            for n in (32768, 65536, 131072, 262144)
        ]
        assert r[0] > r[1] > r[2] > r[3]
        assert r[3] < 1.15

    def test_memory_unlock_matches_measured_frontier(self):
        """The D=1 packed in-core bound must cover the MEASURED single-chip
        packed compile frontier (f32 81920; 86016 crashes the compile
        helper — STATUS_r3 session 10/11) without absurd slack, and the
        large-D unlock ratio must approach the √2 of the resident-memory
        geometry."""
        from dla_tpu.parallel.model import packed_mesh_max_n

        m1 = packed_mesh_max_n(1)
        assert 81920 <= m1["max_n_packed"] <= 98304, m1
        assert m1["max_n_packed"] > m1["max_n_dense"]
        m8 = packed_mesh_max_n(8)
        assert 1.15 <= m8["max_n_packed"] / m8["max_n_dense"] <= 1.5

    def test_projection_fields_sane(self):
        from dla_tpu.parallel.model import project_packed_cyclic

        r = project_packed_cyclic(131072, 4096, 8)
        assert 0 < r["comm_fraction"] < 1
        assert r["speedup"] > 1  # the memory-unlocked regime pays
        assert not r["single_chip_fits"]  # f32 131072 exceeds one chip
        assert r["resident_bytes_per_dev"] < CHIPS["v5e"].hbm_gib * 2**30
        assert r["flop_ratio"] > 1.0

    def test_measured_curves_at_knots(self):
        """The default/bf16 tier curves return the campaign medians at
        their knots (best formulation per N — packed past the dense
        in-core limit)."""
        assert single_chip_rate(32768, tier="default") == pytest.approx(
            95521.0)
        assert single_chip_rate(81920, tier="default") == pytest.approx(
            154338.0)
        assert single_chip_rate(106496, tier="bf16") == pytest.approx(
            172036.0)
        # "highest" has no measured curve: scales the high curve (legacy)
        assert single_chip_rate(32768, tier="highest") == pytest.approx(
            49437.0 * CHIPS["v5e"].tflops["highest"]
            / CHIPS["v5e"].tflops["high"])


class TestDf64MeshProjection:
    """r5: the df64 mesh projection — the fp64-contract crossover (when a
    mesh beats one chip at 1e-10) with the measured df64 curve and
    pair-stacked (planes=2) ring comm."""

    def test_curve_knots_and_projection_sane(self):
        from dla_tpu.parallel.model import project_packed_cyclic

        # measured knots (results_r4/df64_probe.jsonl medians)
        assert single_chip_rate(46080, tier="f64x") == pytest.approx(4755.0)
        assert single_chip_rate(16384, tier="f64x") == pytest.approx(3180.0)
        r = project_packed_cyclic(65536, 4096, 8, tier="f64x", planes=2)
        assert 0 < r["comm_fraction"] < 1
        assert not r["single_chip_fits"]  # 8*65536^2/2 B > one chip
        assert r["speedup"] > 1
        # pair residency is exactly 2x the fp32 plane's
        r1 = project_packed_cyclic(65536, 4096, 8, tier="f64x", planes=1)
        assert r["resident_bytes_per_dev"] == 2 * r1["resident_bytes_per_dev"]
        # pair comm moves 2x the bytes -> strictly more comm time
        assert r["t_comm_s"] > r1["t_comm_s"]

    def test_committed_artifact_matches_model(self):
        """benchmarks/results_r5/df64_mesh_projection.json must equal what
        the model produces today (regenerate with
        `python benchmarks/df64_mesh_projection.py`)."""
        import json
        import os

        from dla_tpu.parallel.model import (
            packed_crossover,
            packed_mesh_max_n,
        )

        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "benchmarks", "results_r5", "df64_mesh_projection.json",
        )
        with open(path) as f:
            art = json.load(f)
        for row in art["memory_unlock"]:
            m = packed_mesh_max_n(
                row["ndev"], nb=row["nb"], itemsize=row["itemsize"])
            assert m["max_n_packed"] == row["max_n_packed"], row
        for row in art["crossovers"]:
            c = packed_crossover(
                row["ndev"], tier=row["tier"], nb=row["nb"],
                itemsize=row["itemsize"], planes=row["planes"])
            assert c["crossover_n"] == row["crossover_n"], row
            assert c["mesh_max_n"] == row["mesh_max_n"]
            assert c["at_mesh_max"]["dist_gflops"] == pytest.approx(
                row["gflops_at_mesh_max"], rel=1e-3)


class TestPackedProjectionArtifact:
    def test_committed_artifact_matches_model(self):
        """benchmarks/results_r3/packed_projection.json must equal what the
        model produces today (regenerate with
        `python benchmarks/projections_r3.py`)."""
        import json
        import os

        from dla_tpu.parallel.model import (
            packed_crossover,
            packed_mesh_max_n,
        )

        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "benchmarks", "results_r3", "packed_projection.json",
        )
        with open(path) as f:
            art = json.load(f)
        for row in art["memory_unlock"]:
            m = packed_mesh_max_n(
                row["ndev"], nb=row["nb"], itemsize=row["itemsize"])
            assert m["max_n_packed"] == row["max_n_packed"], row
            assert m["max_n_dense"] == row["max_n_dense"], row
        for row in art["crossovers"]:
            c = packed_crossover(
                row["ndev"], tier=row["tier"], nb=row["nb"],
                itemsize=row["itemsize"])
            assert c["crossover_n"] == row["crossover_n"], row
            assert c["mesh_max_n"] == row["mesh_max_n"]
            assert c["at_mesh_max"]["dist_gflops"] == pytest.approx(
                row["gflops_at_mesh_max"], rel=1e-3)


class TestOocoreProjection:
    def test_host_model_matches_measured_n163840(self):
        """The calibrated single-host model must reproduce the measured
        N=163840 end-to-end time (21,129 s, 69.4 GF/s —
        results_r3/oocore_n163840.log) within 5%. gemm rate and staging
        rates are independent measurements; only `overhead` is fitted."""
        from dla_tpu.parallel.model import project_oocore_host

        r = project_oocore_host(163840, 4096)
        assert abs(r["t_total_s"] - 21129) / 21129 < 0.05, r["t_total_s"]
        assert abs(r["gflops"] - 69.4) / 69.4 < 0.06

    def test_volumes_match_run_log(self):
        """Exact stream volume must match the run's own staging line
        (717.50 GiB in at N=163840 panel=4096)."""
        from dla_tpu.parallel.model import oocore_volumes

        v = oocore_volumes(163840, 4096)
        assert abs(v["stream_bytes"] / 2**30 - 717.50) < 1.0
        # writeback ≈ lower-triangle store (51.25 GiB out)
        assert abs(v["writeback_bytes"] / 2**30 - 51.25) < 1.5

    def test_mesh_projection_stream_bound_at_pcie(self):
        """Config-5 (N=262144) on any mesh at PCIe-class 32 GB/s staging
        is stream-bound; min compute-bound bandwidth grows with mesh size."""
        from dla_tpu.parallel.model import project_oocore_mesh

        prev = 0.0
        for p, q in ((2, 2), (2, 4), (4, 4)):
            m = project_oocore_mesh(262144, 4096, p, q, host_bw_gbps=32.0)
            assert m["bound"] == "stream", m
            assert m["min_bw_gbps_compute_bound"] > prev
            prev = m["min_bw_gbps_compute_bound"]
            assert m["panel_fits_hbm"]

    def test_larger_panel_cuts_stream(self):
        from dla_tpu.parallel.model import oocore_volumes

        a = oocore_volumes(131072, 2048)["stream_bytes"]
        b = oocore_volumes(131072, 4096)["stream_bytes"]
        assert b < a


class TestOocoreComboProjection:
    """VERDICT r3 #4: the measured distributed out-of-core combo pins the
    model. Calibration: the sharded-update GEMM micro (70 GF/s on the 2x4
    virtual mesh) + (overhead, per-panel fixed) fitted on the N∈{16384,
    24576} runs; validation is CROSS-SIZE on fresh runs
    (results_r4/oocore_combo_validation.log — N=49152 within 10%; the
    N=32768 run executed in this environment's heaviest-contention window
    (concurrent TPU campaign children) and sits at −16%, gated ≤20%)."""

    def test_fit_points_reproduce(self):
        from dla_tpu.parallel.model import project_oocore_combo

        for n, meas in ((16384, 75.7), (24576, 168.0)):
            r = project_oocore_combo(n)
            assert abs(r["t_total_s"] - meas) / meas < 0.02, (n, r)

    def test_cross_size_validation(self):
        from dla_tpu.parallel.model import project_oocore_combo

        r = project_oocore_combo(49152)
        assert abs(r["t_total_s"] - 994.1) / 994.1 < 0.10, r["t_total_s"]
        # r5 quiet-window re-pin: 350.6 s (33.46 GF/s, Freivalds
        # 3.52e-07 PASS — results_r5/oocore_combo_repin_n32768.log);
        # the r4 385.6 s ran under a concurrent TPU campaign and sat
        # at -16% — the contention explanation is now MEASURED (model
        # -7.5% vs the quiet run, inside the standard +/-10% gate)
        r = project_oocore_combo(32768)
        assert abs(r["t_total_s"] - 350.6) / 350.6 < 0.10, r["t_total_s"]


class TestServingSharded:
    """Multi-chip serving (`parallel/serving.py`): correctness of the
    row-sharded inverse apply on the virtual mesh, the all-gather volume
    pinned to the compiled HLO, and projection-model sanity."""

    def test_sharded_apply_matches_dense(self):
        from dla_tpu.algos.potri import potri
        from dla_tpu.algos.potrf import potrf_blocked
        from dla_tpu.parallel.serving import (
            make_serving_mesh, solve_inverse_sharded,
        )

        rng = np.random.default_rng(71)
        n, nrhs, p = 64, 5, 8
        g = rng.standard_normal((n, n))
        a = (g + g.T) / 2 + n * np.eye(n)
        b = rng.standard_normal((n, nrhs))
        l = potrf_blocked(jnp.asarray(a), nb=16)
        ainv = potri(l)
        mesh = make_serving_mesh(p)
        x = np.asarray(solve_inverse_sharded(ainv, jnp.asarray(b), mesh))
        np.testing.assert_allclose(a @ x, b, rtol=1e-9, atol=1e-9)

    def test_allgather_volume_matches_hlo(self):
        """The projection model's comm term claims one ring all-gather of
        (p-1)/p·n·nrhs elements per query; the compiled HLO must carry
        exactly one all-gather whose operand·(p-1) equals that."""
        from dla_tpu.parallel.serving import (
            make_serving_mesh, serving_comm_elems, sharded_apply,
        )
        from jax.sharding import NamedSharding, PartitionSpec as P

        n, nrhs, p = 128, 8, 8
        mesh = make_serving_mesh(p)
        ainv = jax.device_put(
            jnp.eye(n, dtype=jnp.float64),
            NamedSharding(mesh, P("d", None)),
        )
        b = jnp.zeros((n, nrhs), jnp.float64)
        hlo = jax.jit(sharded_apply(mesh)).lower(ainv, b).compile().as_text()
        ops = [c for c in _collectives(hlo) if c[0] == "all-gather"]
        assert len(ops) == 1, ops
        op, elems, glen = ops[0]
        assert glen == p
        operand = elems // glen
        assert operand * (p - 1) == serving_comm_elems(n, nrhs, p)

    def test_projection_sanity(self):
        from dla_tpu.parallel.serving import project_serving, serving_rate

        # rate curve monotone in nrhs and saturating at the ends
        assert serving_rate(1) < serving_rate(64) < serving_rate(1024)
        assert serving_rate(1) == serving_rate(0)
        assert serving_rate(1024) == serving_rate(8192)
        r = project_serving(16384, 128, 4)
        assert 0 < r["comm_fraction"] < 1
        assert 0 < r["speedup"] < 4
        assert r["efficiency"] == pytest.approx(r["speedup"] / 4)
        # the memory-unlock claim: f32 A^-1 at the north-star size does
        # not fit one v5e (17.2 GiB > 15.75) but does fit 4 ways
        big = project_serving(65536, 128, 4)
        assert not big["single_chip_holds_ainv"]
        assert big["mesh_holds_ainv"]

    def test_wide_rhs_pays_narrow_does_not(self):
        """The serving analogue of the reference's 'hybrid pays only at
        N>=12000': single-RHS queries are latency/comm-bound and sharding
        loses; wide blocks amortize the all-gather and win."""
        from dla_tpu.parallel.serving import project_serving

        narrow = project_serving(16384, 1, 4)
        wide = project_serving(16384, 4096, 4)
        assert narrow["speedup"] < wide["speedup"]
        assert wide["speedup"] > 1

    def test_committed_serving_artifact_matches_model(self):
        """benchmarks/results_r3/serving_projection.json must equal what
        the model produces today (regenerate with
        benchmarks/serving_projection.py)."""
        import json
        import os

        from dla_tpu.parallel.serving import project_serving

        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "benchmarks", "results_r3", "serving_projection.json",
        )
        with open(path) as f:
            rows = json.load(f)
        assert len(rows) == 96  # 2 chips x 3 N x 4 nrhs x 4 p
        for row in rows:
            r = project_serving(
                row["n"], row["nrhs"], row["p"], chip=row["chip"]
            )
            assert r["speedup"] == pytest.approx(row["speedup"], rel=1e-9)
            assert r["cols_per_s"] == pytest.approx(
                row["cols_per_s"], rel=1e-9
            )
