"""Headline benchmark: single-chip tiled POTRF GFLOP/s on real TPU hardware.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "GFLOP/s", "vs_baseline": N, ...}

``value`` is measured at the library-default ``high`` matmul precision
(3-pass bf16x3 — the TPU's fp32-effective mode, the tier BASELINE.md's
"fp32-effective peak ~65.7 TF/s" accounting corresponds to; measured
end-to-end it matches true-fp32 ``highest`` in residual at 1.56× the
throughput, see utils/precision.py). The other tiers are also measured
(time budget permitting) and reported as ``tiers`` entries: ``highest`` =
6-pass true fp32 (~31.4 TF/s ceiling), ``default`` = 1-pass bf16 (~182
TF/s ceiling). Every tier carries its own residual so the
precision/throughput trade is machine-readable (VERDICT r1 "what's weak" #1).

Baseline: the reference's repo-best 204.8 GFLOP/s — fp64 DPOTRF at N=16000,
NB=448, hybrid 3CPU+1GPU via Chameleon/StarPU (BASELINE.md; bench.csv).
GFLOP/s accounting matches the reference exactly: (1/3)·N³ / t
(``v6_test.c:60`` — no lower-order terms).

Each tier runs at its own measured frontier config
(`precision[:formulation[:nb[:kb[:n]]]]` specs, BENCH_PRECISIONS): the
single-buffer inplace formulation gains throughput with N all the way to
each storage dtype's in-core limit, so the headline N is the frontier
size, exactly as the reference's repo-best picked its own best (N, NB)
from its sweep. Validation at sizes where A and L cannot co-reside in
HBM uses the matrix-free device-Freivalds probe — the same gate contract
as the campaign driver and the out-of-core runs.

Timing convention: the headline ``value`` amortizes the axon tunnel's
~30-46 ms host↔device RTT by chaining K on-device factorizations through a
scalar carry and subtracting the identically-chained generation time (the
reference's local clock_gettime sync costs ~µs; the per-precision MXU
ceilings this number is compared against were measured the same
RTT-corrected way). ``gflops_raw`` keeps the r1/r2 per-invocation
convention (one RTT embedded per iteration) for continuity.

Diagnostics go to stderr; stdout is the single JSON line.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

BASELINE_GFLOPS = 204.8  # reference repo-best (BASELINE.md)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    # N/NB frontier (campaign, results_r2/sweep.csv): N=32768 beats both
    # 28672 and 36864 (the latter regresses under HBM pressure), and at the
    # `high` tier NB=8192 beats 4096 (36.7 vs 35.2 TF/s medians)
    n = int(os.environ.get("BENCH_N", 32768))
    nb = int(os.environ.get("BENCH_NB", 8192))
    iters = int(os.environ.get("BENCH_ITERS", 3))
    panel = os.environ.get("BENCH_PANEL", "blocktrsm")
    trailing = os.environ.get("BENCH_TRAILING", "pallas")
    tb = int(os.environ.get("BENCH_TB", 1024))
    kb = int(os.environ.get("BENCH_KB", 256))
    alias = os.environ.get("BENCH_ALIAS", "0") == "1"
    ib = int(os.environ.get("BENCH_IB", 512))  # panel blocked-TRSM / twolevel
    # diag inner block (r3 sweep knob)
    # diag-factor backend per tier (measured, results/micro3_r2.jsonl): the
    # two-level MXU factor wins big at default (0.4 ms vs 20 ms) and mildly
    # at high, but loses to lax at highest (12.6 ms vs 5.9 ms — the 6-pass
    # inner GEMMs cost more than XLA's batched-loop factor saves).
    diag_env = os.environ.get("BENCH_DIAG", "auto")
    diag_for = lambda p: (  # noqa: E731
        diag_env if diag_env != "auto"
        else ("lax" if p == "highest" else "twolevel")
    )
    diag = diag_env
    # headline tier first (the library default), so a tight time budget
    # still yields the headline number. Each entry is `precision` or
    # `precision:formulation` (shrink is the default formulation; the r3
    # study found single-buffer `inplace` beats shrink at the high tier —
    # no trailing-square re-materialization traffic)
    # inplace first: it is the measured-fastest high-tier formulation (r3
    # NB/kb-frontier sweep, results_r3/inplace_nb_sweep.jsonl: 54.6 TF/s at
    # NB=1024 kb=1024 vs shrink's 43.9-45.5 at its own NB=8192 frontier,
    # better residual), so a compile-queue stall that eats the budget still
    # leaves the best headline. Per-tier NB/kb: the frontier is
    # formulation- and tier-dependent (shrink 8192/256; high-inplace
    # 1024/1024 i.e. full-K; default-inplace 4096/1024).
    # default tier: full-K trailing (kb=nb=4096) measured +16% over kb=1024
    # (105 → 122 TF/s chained, results_r3/trailing_tb.jsonl) — every C-tile
    # revisit is an extra accumulate-store round trip on the HBM-bound tier
    # one entry per precision tier (high/default/highest) + the bf16
    # policy block below. The r2-era `high` shrink entry was dropped from
    # the default list: high:inplace IS precision=high (the shrink-vs-
    # inplace comparison lives in the campaign CSV and
    # results_r3/bench_headline_55tf.json), and on this remote compile
    # service every extra tier costs ~2 program loads at 45-90 s each —
    # the 5-entry list reproducibly budget-skipped the bf16 tier.
    # `bf16` is a pseudo-precision: bfloat16 storage through the
    # single-buffer inplace formulation at the default (1-pass) MXU tier —
    # the complete bf16 policy space (the compiler rejects HIGH-precision
    # dots on bf16 operands, ROADMAP negative result).
    # Per-tier N (5th spec field): throughput rises with N on the
    # single-buffer inplace path all the way to each storage dtype's
    # in-core frontier (probes committed as results_r3/probe_frontier_*):
    # high fp32 peaks at its in-core limit N=61440, 15.06 GiB (59.5 TF/s
    # chained = 94.5% of the bf16x3 ceiling; 57344 measured 59.4),
    # default fp32 at 57344 (150.7 = 83% of the 1-pass ceiling; 49152:
    # 144.2), bf16 at 65536 (164.0 = 90% of the 1-pass ceiling; the
    # N=81920 probe measured LOWER, 160.2 — the bf16 curve is flat past
    # the north-star size, probe_frontier2.log). `highest` stays at the
    # r1/r2-comparable N=32768 shrink config.
    # The default/bf16 tier entries carry the packed formulation at its
    # frontier N (triangle-only storage + the aliased Pallas trailing
    # kernel): the r3 on-chip probes measured packed ABOVE the dense
    # inplace entries at both HBM-bound tiers — f32 154.5 TF/s @81920
    # (dense: 150.8 @57344), bf16 172.2 @106496 (dense: 164.1 @65536) —
    # results_r3/packed_probe.jsonl. Dense inplace rows remain in the
    # campaign CSVs (sweep_kb.csv) for formulation A/Bs.
    # `highest` stays on the r1/r2-comparable shrink@N=32768 config: at the
    # 9-pass tier the dots are so compute-dominant that inplace's
    # trailing-traffic savings don't matter, and shrink's NB=8192 panel
    # amortizes better (measured: inplace 24.2 vs shrink 26.2 TF/s,
    # STATUS_r3 session 5) — the one tier whose frontier is NOT inplace.
    # `f64x` (last: the headline tiers have budget priority) is the
    # emulated-fp64 tier — double-word fp32 storage, meets the reference's
    # OWN fp64 1e-10 gate on the accelerator (the reference's best fp64 is
    # 204.8 GF/s; spec grammar f64x[:slices], benchmarks/df64_probe.jsonl).
    tiers = os.environ.get(
        "BENCH_PRECISIONS",
        "high:inplace:1024:1024:61440,default:packed:4096:4096:81920,"
        "highest,bf16:packed:4096:4096:106496,f64x:7",
    ).split(",")
    # 480 s fit the old all-at-N=32768 list; the per-tier frontier sizes
    # legitimately cost more device time (N=61440 high ≈ 1.32 s/factor ×
    # (3 raw + 8 chained) + ~76 s Freivalds) plus 2 remote program loads
    # per tier at 45-90 s each on this compile service
    # (900: the late-r3 frontier bump — high 57344→61440, default
    # 49152→57344 — adds ~80 s of legitimate device time; 750 would
    # budget-skip the bf16 tier again)
    # (1400: the r5 f64x tier runs its CERTIFIED FRONTIER N=24576 —
    # ~90 s factor program load + 3×1.3 s iters + the block-tiled device
    # residual's three program loads + ~23 s gate run ≈ 350 s worst-case
    # uncached-load budget; the old N=8192 tier paid a comparable cost in
    # balloon-throttled host fp64 generation, now gone — input is
    # device-generated)
    budget_s = float(os.environ.get("BENCH_BUDGET_S", 1400))

    import jax

    cache_dir = os.environ.get("BENCH_CACHE_DIR", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from dla_tpu.algos import potrf_shrink
    from dla_tpu.ops import plgsy
    from dla_tpu.validate import residual_potrf

    log(f"backend={jax.default_backend()} devices={jax.devices()}")
    log(
        f"N={n} NB={nb} dtype=float32 iters={iters} panel={panel} "
        f"trailing={trailing} tb={tb} kb={kb} alias={alias} diag={diag} tiers={tiers}"
    )

    # Absorb the compile service's first-contact stall OUTSIDE the budget
    # clock: the remote TPU compile service stalls spontaneously for
    # minutes before accepting a fresh process's first compile (CLAUDE.md;
    # seen as a ~300 s first-tier wall in an otherwise fully-cached run).
    # That queue artifact is not a property of any tier, so it must not
    # eat tiers out of the budget.
    t0 = time.perf_counter()
    _ = float(jnp.linalg.norm(jnp.ones((256, 256), jnp.float32)))
    log(f"device warmup (first-contact): {time.perf_counter() - t0:.1f}s")
    t_start = time.perf_counter()

    # per-dtype program memos: gen / tril / residual-check are identical
    # programs across the fp32 tiers — re-jitting them per tier pays a
    # needless compile + remote program load (~15 s each) per tier
    _gens: dict = {}
    _trils: dict = {}
    _checks: dict = {}
    _chain_gens: dict = {}  # (genf, jitted chain-gen) per dtype — the
    # gen-chain program is tier-independent; loading it once per dtype
    # saves one remote program load (~15-60 s on this service) per tier

    from dla_tpu.ops.lapack_like import plgsy_tile

    def _gen_value(s, dt, n):
        """Seeded SPD matrix + s·I in storage dtype ``dt``, never
        materializing an N² buffer wider than ``dt``.

        Fused path: one elementwise program (iota-compare-select diagonal
        add, NOT a scatter — a scatter breaks XLA's fusion of the
        generator into the output buffer and materializes the fp32 N²
        intermediate: 17.2 GB > HBM for the bf16 N=65536 matrix).
        Chunked path (large non-f32 sizes): XLA stops fusing the u32 hash
        intermediates into the narrow output inside larger programs (seen
        OOMing the chained-factor program at N=65536), so generate
        (chunk, n) fp32 slabs in a fori_loop and cast per slab — peak
        extra memory is one slab.
        """
        chunk = 2048
        idx = jnp.arange(n)
        if dt == jnp.float32 or n * n * 4 <= 10e9 or n % chunk:
            a = plgsy(n, bump=float(n), seed=51, dtype=jnp.float32)
            a = a + jnp.where(
                idx[:, None] == idx[None, :], s, jnp.float32(0.0))
            return a if dt == jnp.float32 else a.astype(dt)

        def body(i, out):
            r0 = i * chunk
            rows = r0 + jnp.arange(chunk, dtype=jnp.int32)
            tile = plgsy_tile(51, r0, 0, chunk, n,
                              bump=float(n), dtype=jnp.float32)
            tile = tile + jnp.where(
                rows[:, None] == idx[None, :], s, jnp.float32(0.0))
            return jax.lax.dynamic_update_slice(
                out, tile.astype(dt), (r0, 0))

        return jax.lax.fori_loop(0, n // chunk, body, jnp.zeros((n, n), dt))

    def make_gen(dt, n):
        @jax.jit
        def gen(s):
            # the per-iteration bump perturbation keeps any execution-level
            # caching honest across timed repeats
            return _gen_value(s, dt, n)

        return gen

    chain_k = int(os.environ.get("BENCH_CHAIN", 4))

    def run_tier(prec: str, *, storage: str = "float32",
                 formulation: str = "shrink", nb: int = nb,
                 kb: int = kb, n: int = n):
        """One (precision tier, storage dtype, formulation, nb) measurement.

        The default storage/formulation is the library headline path
        (fp32 shrink); ``storage="bfloat16", formulation="inplace"`` is
        the split-precision policy from the r3 study (half the HBM
        bytes through the single-buffer ``potrf_inplace``). ``nb``
        defaults to the global BENCH_NB but a tier spec may override it —
        the NB frontier is formulation-dependent (r3: shrink prefers
        8192, inplace 4096)."""
        dt = jnp.bfloat16 if storage == "bfloat16" else jnp.float32
        tag = prec if dt == jnp.float32 else f"bf16/{prec}"
        if formulation != "shrink":
            tag += f"/{formulation}"
        tag += f"@{n}" if n != 32768 else ""
        if (dt, n) not in _gens:
            _gens[dt, n] = make_gen(dt, n)
        gen = _gens[dt, n]

        def step(a):
            if formulation == "inplace":
                from dla_tpu.algos import potrf_inplace

                return potrf_inplace(
                    a, nb=nb, tb=tb, kb=kb, diag_factor=diag_for(prec),
                    precision=prec, ib=ib,
                )
            return potrf_shrink(
                a, nb=nb, panel=panel, trailing=trailing, tb=tb, kb=kb,
                trailing_alias=alias, diag_factor=diag_for(prec),
                precision=prec, ib=ib,
            )

        # generation happens OUTSIDE the timed region — the reference times
        # dpotrf only (clock_gettime around CHAMELEON_dpotrf_Tile,
        # v6_test.c:54-57); the input buffer is donated so the factorization
        # reuses it instead of holding matrix+workspace simultaneously.
        fn = jax.jit(step, donate_argnums=0)
        a = gen(jnp.float32(0.0))
        _ = float(a[0, 0])
        t0 = time.perf_counter()
        l = fn(a)
        _ = float(l[0, 0])  # scalar readback: block_until_ready is unreliable here
        compile_s = time.perf_counter() - t0
        log(f"[{tag}] compile+first run: {compile_s:.1f}s")
        times = []
        for i in range(iters):
            l = None  # drop the previous factor BEFORE regenerating: holding
            # both adds a full N² buffer to peak HBM (OOM at N=32768)
            a = gen(jnp.float32((i + 1) * 1e-3))
            _ = float(a[0, 0])  # materialize before the clock starts
            t0 = time.perf_counter()
            l = fn(a)
            _ = float(l[n - 1, n - 1])
            t1 = time.perf_counter()
            times.append(t1 - t0)
            log(f"[{tag}] iter {i}: {t1 - t0:.4f}s -> {(n**3 / 3) / (t1 - t0) / 1e9:.1f} GFLOP/s")
        t = sorted(times)[len(times) // 2]  # median, matching plot_grid_all.py
        gflops_raw = (n**3 / 3) / t / 1e9
        t_phase = time.perf_counter()

        def mark(name):
            nonlocal t_phase
            now = time.perf_counter()
            log(f"[{tag}] +{now - t_phase:.1f}s {name} "
                f"(elapsed {now - t_start:.0f}s)")
            t_phase = now

        mark("raw iters done")

        # --- validation (BEFORE the chain: the chain program's internal
        # gen+factor needs ~N² of HBM on top of whatever is live, so the
        # raw factor must be validated and freed first — holding l across
        # the chain OOMs at the in-core frontier sizes) -------------------
        # validate OUTSIDE the check program (regenerating A inside it adds
        # plgsy + diag-add temporaries — 16G > 15.75G HBM at N=32768). The
        # row-chunked residual needs no N² reconstruction temporary (and
        # therefore no buffer donation — the r2 'unusable donation' warning
        # came from the monolithic check's 2×4 GiB donated operands);
        # l is pre-tril'd in place via an elementwise donated program.
        if 2.5 * n * n * jnp.dtype(dt).itemsize > 14.5e9:
            # A and L cannot co-reside in HBM at this N: validate
            # matrix-free with the device Freivalds probe (A regenerated
            # chunkwise from its seed) — the same probe/gate contract as
            # the campaign driver's in-core-frontier path and the
            # out-of-core runs. The factor was taken of A + s·I with
            # s = iters·1e-3 while the probe regenerates bare A; the
            # mismatch contributes ~s/||A||_inf ≈ 1e-8 — far below the
            # fp32 residual scale.
            from dla_tpu.validate import freivalds_device

            chunk_f = next(c for c in (4096, 2048, 1024, 512) if n % c == 0)
            res = float(freivalds_device(
                l, seed=51, bump=float(n), probes=2, row_chunk=chunk_f))
            log(f"[{tag}] freivalds validation (A+L exceed HBM at N={n})")
        else:
            a = gen(jnp.float32(iters * 1e-3))
            rc = next(c for c in (2048, 1024, 512, 256, 128, 1) if n % c == 0)
            if (dt, rc) not in _checks:
                _trils[dt, rc] = jax.jit(jnp.tril, donate_argnums=0)
                _checks[dt, rc] = jax.jit(
                    functools.partial(
                        residual_potrf, assume_symmetric=True,
                        assume_tril=True, row_chunk=rc,
                    ),
                )
            l = _trils[dt, rc](l)
            res = float(_checks[dt, rc](a, l))
        l = None
        a = None
        mark("validation done")

        # --- RTT-amortized device time -----------------------------------
        # Each raw iteration above embeds one host↔device tunnel round trip
        # (~30-46 ms on the axon tunnel — CLAUDE.md; a local-PCIe host pays
        # ~µs, and the per-precision MXU ceilings in STATUS_r2 were measured
        # RTT-corrected). The apples-to-apples device number chains K
        # factorizations on-device through a scalar carry (each step
        # regenerates A from the previous factor's scalar — genuinely
        # sequential work) and subtracts the identically-chained generation
        # time: per-factor = (T_factor_chain − T_gen_chain) / K; the single
        # trailing RTT cancels in the subtraction.
        gflops = gflops_raw
        chain = None
        if chain_k:
            if (dt, n) not in _chain_gens:
                def genf(s, _dt=dt, _n=n):
                    return _gen_value(
                        1e-3 + s.astype(jnp.float32) * 1e-9, _dt, _n)

                _chain_gens[dt, n] = (
                    genf,
                    jax.jit(lambda s: genf(s)[n - 1, n - 1].astype(jnp.float32)),
                )
            genf, cg = _chain_gens[dt, n]

            # the scalar carry stays f32 so the chained call never
            # retraces (bf16 storage would otherwise flip the carry dtype
            # after the first link)
            cf = jax.jit(lambda s: step(genf(s))[n - 1, n - 1].astype(jnp.float32))
            s0 = jnp.float32(0.0)
            _ = float(cf(s0)); _ = float(cg(s0))  # compile + warm
            mark("chain compile+warm")
            t0 = time.perf_counter()
            s = s0
            for _i in range(chain_k):
                s = cf(s)
            _ = float(s)
            t_f = time.perf_counter() - t0
            t0 = time.perf_counter()
            s = s0
            for _i in range(chain_k):
                s = cg(s)
            _ = float(s)
            t_g = time.perf_counter() - t0
            per = (t_f - t_g) / chain_k
            chain = {
                "k": chain_k, "factor_chain_s": round(t_f, 4),
                "gen_chain_s": round(t_g, 4), "per_factor_s": round(per, 4),
            }
            gflops = (n**3 / 3) / per / 1e9
            log(f"[{tag}] chained x{chain_k}: {per:.4f}s/factor -> "
                f"{gflops:.1f} GFLOP/s (gen {t_g / chain_k:.4f}s)")
            mark("chain timed")

        trace_dir = os.environ.get("BENCH_TRACE")
        if trace_dir:
            # one extra (untimed) run under the xprof tracer — inspect with
            # `tensorboard --logdir $BENCH_TRACE` (utils/profiling.trace)
            from dla_tpu.utils.profiling import trace

            a = gen(jnp.float32(-1e-3))
            _ = float(a[0, 0])
            with trace(os.path.join(trace_dir, prec)):
                l2 = fn(a)
                _ = float(l2[n - 1, n - 1])
            l2 = None  # free before returning — keep peak HBM bounded
            log(f"[{tag}] profiler trace written to {trace_dir}/{prec}")

        log(f"[{tag}] Performance: {gflops:.2f} Gflop/s")
        log(f"[{tag}] ||A - LL^T||_inf / ||A||_inf = {res:.2e}")
        out = {"gflops": round(gflops, 1), "gflops_raw": round(gflops_raw, 1),
               "residual": res, "compile_s": round(compile_s, 1)}
        if chain:
            out["chain"] = chain
        return out

    def run_tier_packed(prec: str, *, storage: str = "float32",
                        nb: int = 4096, kb: int | None = None,
                        n: int = 73728):
        """One packed-formulation tier: triangle-only storage
        (``algos/packed.py``, resident ≈ n(n+tb)/2 elements) with the
        aliased single-pass Pallas trailing kernel. Half the resident
        HBM of the dense formulations buys both a ~1.33× larger in-core
        N per dtype AND more throughput at the HBM-bound tiers (the r3
        on-chip A/B: f32 N=65536 77.0 → 147.4 TF/s vs the XLA
        per-column loop; results_r3/packed_probe.jsonl). Validation is
        the matrix-free streamed Freivalds gate — the same contract as
        the driver's in-core-frontier and out-of-core paths (A and a
        dense L cannot co-reside at packed-frontier sizes)."""
        from dla_tpu.algos.packed import (
            freivalds_packed, plgsy_packed, potrf_packed,
        )

        dt = jnp.bfloat16 if storage == "bfloat16" else jnp.float32
        tag = ("bf16/" if dt == jnp.bfloat16 else "") + prec + "/packed"
        tag += f"@{n}"
        tbp = nb
        kbk = kb or tbp

        def genf(s):
            # the [0,0] perturbation makes each link genuinely depend on
            # the previous factor's scalar (chain convention), same as
            # the dense path's s·1e-9 diagonal bump
            p = plgsy_packed(n, tbp, seed=51, dtype=dt)
            return p.at[0, 0].add((s * 1e-9).astype(dt))

        gen = jax.jit(genf)

        def step(p):
            return potrf_packed(
                p, n, tbp, precision=prec, trailing="pallas",
                ktb=1024, kb=kbk, diag_factor=diag_for(prec), ib=ib,
            )

        fn = jax.jit(step, donate_argnums=0)
        a = gen(jnp.float32(0.0))
        _ = float(a[0, 0])
        t0 = time.perf_counter()
        l = fn(a)
        _ = float(l[0, 0])
        compile_s = time.perf_counter() - t0
        log(f"[{tag}] compile+first run: {compile_s:.1f}s")
        times = []
        for i in range(iters):
            l = None
            a = gen(jnp.float32((i + 1) * 1e-3))
            _ = float(a[0, 0])
            t0 = time.perf_counter()
            l = fn(a)
            _ = float(l[0, 0])
            t1 = time.perf_counter()
            times.append(t1 - t0)
            log(f"[{tag}] iter {i}: {t1 - t0:.4f}s -> "
                f"{(n**3 / 3) / (t1 - t0) / 1e9:.1f} GFLOP/s")
        t = sorted(times)[len(times) // 2]
        gflops_raw = (n**3 / 3) / t / 1e9
        res = float(jax.jit(
            lambda p: freivalds_packed(p, n, tbp, seed=51, key=1)
        )(l))
        l = None
        a = None
        log(f"[{tag}] freivalds validation (matrix-free)")

        gflops = gflops_raw
        chain = None
        if chain_k:
            cf = jax.jit(
                lambda s: step(genf(s))[0, 0].astype(jnp.float32))
            cg = jax.jit(lambda s: genf(s)[0, 0].astype(jnp.float32))
            s0 = jnp.float32(0.0)
            _ = float(cf(s0)); _ = float(cg(s0))
            t0 = time.perf_counter()
            s = s0
            for _i in range(chain_k):
                s = cf(s)
            _ = float(s)
            t_f = time.perf_counter() - t0
            t0 = time.perf_counter()
            s = s0
            for _i in range(chain_k):
                s = cg(s)
            _ = float(s)
            t_g = time.perf_counter() - t0
            per = (t_f - t_g) / chain_k
            chain = {
                "k": chain_k, "factor_chain_s": round(t_f, 4),
                "gen_chain_s": round(t_g, 4), "per_factor_s": round(per, 4),
            }
            gflops = (n**3 / 3) / per / 1e9
            log(f"[{tag}] chained x{chain_k}: {per:.4f}s/factor -> "
                f"{gflops:.1f} GFLOP/s (gen {t_g / chain_k:.4f}s)")

        log(f"[{tag}] Performance: {gflops:.2f} Gflop/s")
        log(f"[{tag}] freivalds ||(A-LL^T)x||/(||A|| ||x||) = {res:.2e}")
        out = {"gflops": round(gflops, 1), "gflops_raw": round(gflops_raw, 1),
               "residual": res, "compile_s": round(compile_s, 1),
               "validation": "freivalds"}
        if chain:
            out["chain"] = chain
        return out

    def run_tier_df64(*, nb: int = 1024, n: int = 24576, slices: int = 7):
        """Emulated-fp64 tier (`f64x`): double-word fp32 storage through
        the exact-sliced bf16 MXU GEMM (ops/df64.py, algos/potrf_df64.py)
        — the on-chip path to the reference's own fp64 contract
        (v6_test.c:57 dpotrf, ≤1e-10 residual gate). The tier runs the
        certified frontier configuration (r5: N=24576, fused Pallas
        trailing — measured blocked residual 4.19e-11 AND streaming df64
        Freivalds 6.75e-14, results_r4/df64_probe.jsonl), not the old
        N=8192 warm-up size. Input is the device-generated exactly-fp32
        SPD matrix (lo plane = 0 — the frontier probe convention; the
        FACTOR is not fp32-representable, so the full df64 arithmetic is
        exercised), regenerated un-timed per iteration into a donated
        pair; timing is raw per-invocation, matching the reference's
        dpotrf-only clock. Residual: the v6_test-exact full
        reconstruction ||A − L·Lᵀ||_inf/||A||_inf evaluated in df64 ON
        DEVICE (block-tiled past N=8192), gated at 1e-10."""
        from dla_tpu.algos.potrf_df64 import (
            potrf_df64,
            residual_potrf_df64,
            residual_potrf_df64_blocked,
        )

        tag = f"f64x@{n}"
        gen_d = jax.jit(lambda: plgsy(n, bump=float(n), seed=51,
                                      dtype=jnp.float32))
        zeros = jax.jit(jnp.zeros_like)
        fac = jax.jit(
            functools.partial(potrf_df64, nb=nb, s=slices,
                              trailing="pallas", tb=min(512, nb)),
            donate_argnums=(0, 1))

        def fresh_pair():
            h = gen_d()
            return h, zeros(h)

        ah, al = fresh_pair()
        _ = float(ah[0, 0])
        t0 = time.perf_counter()
        lh, ll = fac(ah, al)
        _ = float(lh[n - 1, n - 1])
        compile_s = time.perf_counter() - t0
        log(f"[{tag}] compile+first run: {compile_s:.1f}s")
        times = []
        for i in range(iters):
            lh = ll = None
            ah, al = fresh_pair()  # un-timed (reference times dpotrf only)
            _ = float(ah[0, 0])
            t0 = time.perf_counter()
            lh, ll = fac(ah, al)
            _ = float(lh[n - 1, n - 1])
            times.append(time.perf_counter() - t0)
            log(f"[{tag}] iter {i}: {times[-1]:.4f}s -> "
                f"{(n**3 / 3) / times[-1] / 1e9:.1f} GFLOP/s")
        t = sorted(times)[len(times) // 2]
        gflops_raw = (n**3 / 3) / t / 1e9
        # v6_test-exact residual on device: A regenerated (exact fp32,
        # lo=None) next to the factor pair — block-tiled gate past 8192
        ah = jax.jit(lambda: plgsy(n, bump=float(n), seed=51,
                                   dtype=jnp.float32))()
        _ = float(ah[0, 0])
        strip_max = int(
            os.environ.get("DLA_TPU_DF64_STRIP_RESIDUAL_MAX", 8192))
        if n > strip_max:
            res = float(residual_potrf_df64_blocked(
                ah, None, lh, ll, s=slices, rc=min(2048, n)))
        else:
            res = float(residual_potrf_df64(
                ah, zeros(ah), lh, ll, s=slices))
        log(f"[{tag}] Performance: {gflops_raw:.2f} Gflop/s")
        log(f"[{tag}] ||A - LL^T||_inf / ||A||_inf = {res:.2e} "
            f"(df64 on device; reference fp64 gate 1e-10: "
            f"{'PASS' if res < 1e-10 else 'FAIL'})")
        return {"gflops": round(gflops_raw, 1),
                "gflops_raw": round(gflops_raw, 1),
                "residual": res, "compile_s": round(compile_s, 1),
                "validation": "df64-device-blocked-residual"}

    results: dict[str, dict] = {}
    for i, spec in enumerate(tiers):
        # spec grammar: `precision[:formulation[:nb[:kb[:n]]]]`; precision
        # `bf16` selects bfloat16 storage at the default compute tier
        parts = spec.strip().split(":")
        prec = parts[0]
        storage = "float32"
        if prec == "bf16":
            storage, prec = "bfloat16", "default"
        form = parts[1] if len(parts) > 1 else "shrink"
        nb_t = int(parts[2]) if len(parts) > 2 else nb
        # '-' = placeholder (tiers that take no kb, e.g. f64x)
        kb_t = (int(parts[3]) if len(parts) > 3 and parts[3] != "-"
                else kb)
        n_t = int(parts[4]) if len(parts) > 4 else n
        elapsed = time.perf_counter() - t_start
        if i > 0 and results:
            # each further tier costs roughly one compile + iters; skip if the
            # remaining budget cannot absorb it (the headline has priority)
            est = max(r["compile_s"] for r in results.values()) + 10
            if elapsed + est > budget_s:
                log(f"[{spec}] skipped: {elapsed:.0f}s elapsed + ~{est:.0f}s est > {budget_s:.0f}s budget")
                continue
        key = f"{prec}_{form}" if form != "shrink" else prec
        if storage == "bfloat16":
            key = f"bf16_{key}"
        if prec == "f64x":
            # spec grammar reuse: f64x[:slices[:nb[:-]][:n]] — the emulated
            # fp64 tier (slices rides the `formulation` slot)
            results["f64x"] = run_tier_df64(
                nb=nb_t if len(parts) > 2 else 1024,
                n=n_t if len(parts) > 4 else 24576,
                slices=int(parts[1]) if len(parts) > 1 else 7,
            )
            results["f64x"]["nb"] = nb_t if len(parts) > 2 else 1024
            results["f64x"]["n"] = n_t if len(parts) > 4 else 24576
            continue
        if form == "packed":
            results[key] = run_tier_packed(prec, storage=storage,
                                           nb=nb_t, kb=kb_t, n=n_t)
        else:
            results[key] = run_tier(prec, storage=storage, formulation=form,
                                    nb=nb_t, kb=kb_t, n=n_t)
        results[key]["nb"] = nb_t
        results[key]["n"] = n_t
        if kb_t != kb:
            results[key]["kb"] = kb_t

    from dla_tpu.utils.precision import DEFAULT as LIB_DEFAULT_PRECISION

    head_tier = (
        LIB_DEFAULT_PRECISION if LIB_DEFAULT_PRECISION in results
        else next(iter(results))
    )
    head = results[head_tier]
    # same precision tier, fp32 storage, different formulation: promote the
    # faster one to headline if its residual is in the same class (the r3
    # study: inplace ≥ shrink at `high` — identical numerics, no
    # trailing-square re-materialization traffic)
    alt = results.get(f"{head_tier}_inplace")
    if alt and alt["gflops"] > head["gflops"] and (
        alt["residual"] <= 5 * head["residual"]
    ):
        head_tier, head = f"{head_tier}_inplace", alt
    out = {
        "metric": (
            f"POTRF fp32({head_tier}) N={head.get('n', n)} "
            f"NB={head.get('nb', nb)} single-chip"
        ),
        "value": head["gflops"],
        "unit": "GFLOP/s",
        # 4 significant digits, not 2 decimals: a tiny smoke-test run
        # (sub-GF/s on a contended CPU) must not round down to 0.0
        "vs_baseline": float(f"{head['gflops'] / BASELINE_GFLOPS:.4g}"),
        "residual": head["residual"],
        "gflops_raw": head.get("gflops_raw"),
        "tiers": {
            p: {"gflops": r["gflops"], "gflops_raw": r.get("gflops_raw"),
                "residual": r["residual"], "nb": r.get("nb", nb),
                "n": r.get("n", n),
                **({"validation": r["validation"]}
                   if "validation" in r else {})}
            for p, r in results.items()
        },
        "config": {"panel": panel, "trailing": trailing, "tb": tb, "kb": kb,
                   "alias": alias, "diag_factor": diag, "ib": ib},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
