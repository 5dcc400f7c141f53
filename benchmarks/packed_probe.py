"""On-chip probe for the packed (triangle-only) storage path.

Phases (all in one process — one TPU process at a time, CLAUDE.md):

A. N=16384 serving A/B: dense explicit-inverse (`solve_inverse`) vs the
   packed symmetric inverse (`solve_inverse_packed`) at nrhs 1/128/1024.
   The packed apply streams n(n+tb)/2 elements per query — the narrow
   HBM-bound regime should run ~2x the dense GEMM; memory is halved.
B. N=65536 f32 **frontier unlock**: generate packed (no dense square
   ever) -> potrf_packed -> freivalds gate -> potri_packed -> serve.
   Dense f32 at this N is infeasible (17.2 GiB > HBM): previously
   bf16-only. Packed f32: 9.1 GiB.
C. N=73728 f32: same pipeline one size up (11.3 GiB packed).
D. N=81920 f32 factor-only stretch (14.0 GiB packed + slabs).

Run (detached — compile-service rules):
    setsid nohup python benchmarks/packed_probe.py \
        > benchmarks/results_r3/packed_probe.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
from jax import lax

CHAIN = int(os.environ.get("PACKED_CHAIN", 8))
PHASES = os.environ.get("PACKED_PHASES", "ABCD")
OUT = os.path.join(REPO, "benchmarks/results_r3/packed_probe.jsonl")


def log(*a):
    print(*a, flush=True)


def emit(row):
    log(json.dumps(row))
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")


def time_chain(cf, op, b0, n, nrhs, tag):
    t0 = time.perf_counter()
    xc = cf(op, b0)
    _ = float(xc[n - 1, nrhs - 1])
    log(f"[{tag}] compile+warm: {time.perf_counter() - t0:.1f}s")
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        xc = cf(op, b0)
        _ = float(xc[n - 1, nrhs - 1])
        times.append(time.perf_counter() - t0)
    del xc
    return sorted(times)[1] / CHAIN


def serve_rows(apply_fn, operand, n, tb, tag, packed: bool,
               extra=None):
    """Chained serving timing at three widths + streamed forward error."""
    from dla_tpu.algos.packed import spd_matvec_streamed

    bytes_ainv = (n * (n + tb) // 2 if packed else n * n) * 4
    for nrhs in (1, 128, 1024):
        b0 = jax.random.normal(jax.random.PRNGKey(0), (n, nrhs),
                               jnp.float32)

        def chain(op, b0):
            def body(_i, x):
                return apply_fn(op, b0 + jnp.float32(1e-20) * x)

            return lax.fori_loop(0, CHAIN, body, jnp.zeros_like(b0))

        per = time_chain(jax.jit(chain), operand, b0, n, nrhs,
                         f"{tag} nrhs={nrhs}")
        row = {
            "path": tag, "n": n, "tb": tb, "nrhs": nrhs,
            "per_solve_s": round(per, 6),
            "gflops": round(2.0 * n * n * nrhs / per / 1e9, 1),
            "rhs_cols_per_s": round(nrhs / per, 1),
            "ainv_read_gbs": round(bytes_ainv / per / 1e9, 1),
            "resident_gib": round(bytes_ainv / 2**30, 2),
        }
        if extra:
            row.update(extra)
        if nrhs == 128:
            x1 = jax.jit(apply_fn)(operand, b0)
            ax = jax.jit(
                lambda x: spd_matvec_streamed(x, n, seed=7, cb=2048)
            )(x1)
            num = float(jnp.max(jnp.abs(ax - b0)))
            den = float(jnp.max(jnp.abs(b0)))
            res = num / den / n  # scale ~ ||A||~n for the bump matrix
            row["fwd_err_scaled"] = res
            log(f"[{tag} nrhs=128] scaled fwd err {res:.2e} "
                f"{'PASS' if res < 2e-4 else 'FAIL'}")
            del x1, ax
        emit(row)
        del b0


def phase_a():
    from dla_tpu.algos import potrf_inplace, potri, solve_inverse
    from dla_tpu.algos.packed import (
        pack_tri, potri_packed, solve_inverse_packed,
    )
    from dla_tpu.ops import plgsy

    n = int(os.environ.get("PACKED_N_A", 16384))
    tb = int(os.environ.get("PACKED_TB_A", 2048))
    log(f"=== phase A: serving A/B at N={n} tb={tb}")
    a = jax.jit(lambda: plgsy(n, seed=7, dtype=jnp.float32))()
    _ = float(a[0, 0])
    l = jax.jit(
        lambda x: potrf_inplace(x, nb=1024, tb=1024, kb=1024,
                                precision="high")
    )(a)
    _ = float(l[n - 1, n - 1])
    del a
    # dense inverse
    inv = jax.jit(lambda l: potri(l, blocked=True, ib=1024))
    ainv = inv(l)
    _ = float(ainv[n - 1, n - 1])
    t0 = time.perf_counter()
    ainv = inv(l)
    _ = float(ainv[n - 1, n - 1])
    t_dense_build = time.perf_counter() - t0
    log(f"dense potri warm: {t_dense_build:.3f}s")
    serve_rows(lambda op, b: solve_inverse(op, b), ainv, n, tb,
               "inverse_dense", packed=False,
               extra={"build_warm_s": round(t_dense_build, 3)})
    del ainv
    # packed inverse
    lp = jax.jit(lambda l: pack_tri(l, tb))(l)
    _ = float(lp[0, 0])
    del l
    pinv = jax.jit(lambda p: potri_packed(p, n, tb), donate_argnums=0)
    sp = pinv(lp)
    _ = float(sp[0, 0])
    # rebuild lp for a warm timing (donated away)
    from dla_tpu.algos.packed import plgsy_packed, potrf_packed

    lp2 = jax.jit(
        lambda: potrf_packed(plgsy_packed(n, tb, seed=7,
                                          dtype=jnp.float32),
                             n, tb, precision="high")
    )()
    _ = float(lp2[0, 0])
    t0 = time.perf_counter()
    sp = pinv(lp2)
    _ = float(sp[0, 0])
    t_packed_build = time.perf_counter() - t0
    log(f"packed potri warm: {t_packed_build:.3f}s "
        f"({2.0 * n**3 / 3 / t_packed_build / 1e12:.1f} TF/s at 2n^3/3)")
    serve_rows(lambda op, b: solve_inverse_packed(op, b, n, tb), sp, n,
               tb, "inverse_packed", packed=True,
               extra={"build_warm_s": round(t_packed_build, 3)})
    del sp


def frontier(n, tb, precision, do_potri=True, do_serve=True,
             dtype=jnp.float32, trailing="xla"):
    from dla_tpu.algos.packed import (
        freivalds_packed, plgsy_packed, potrf_packed, potri_packed,
        solve_inverse_packed,
    )

    isz = jnp.dtype(dtype).itemsize
    gib = n * (n + tb) / 2 * isz / 2**30
    log(f"=== frontier N={n} tb={tb} precision={precision} "
        f"dtype={jnp.dtype(dtype).name} trailing={trailing} "
        f"packed={gib:.1f} GiB")
    gen = jax.jit(lambda: plgsy_packed(n, tb, seed=7, dtype=dtype))
    t0 = time.perf_counter()
    ap = gen()
    _ = float(ap[0, 0])
    log(f"gen: {time.perf_counter() - t0:.1f}s (incl compile)")
    fkw = dict(precision=precision)
    if trailing == "pallas":
        fkw.update(trailing="pallas", ktb=1024, kb=tb)
    fact = jax.jit(
        lambda p: potrf_packed(p, n, tb, **fkw),
        donate_argnums=0,
    )
    t0 = time.perf_counter()
    lp = fact(ap)
    _ = float(lp[0, 0])
    log(f"potrf_packed cold: {time.perf_counter() - t0:.1f}s")
    del lp  # lp + a regenerated ap cannot co-reside at frontier sizes
    ap = gen()
    _ = float(ap[0, 0])
    t0 = time.perf_counter()
    lp = fact(ap)
    _ = float(lp[0, 0])
    t_fact = time.perf_counter() - t0
    gf = n**3 / 3 / t_fact / 1e9
    log(f"potrf_packed warm: {t_fact:.2f}s = {gf:.0f} GF/s")
    t0 = time.perf_counter()
    res = float(jax.jit(
        lambda p: freivalds_packed(p, n, tb, seed=7, key=1)
    )(lp))
    # f32: ~N*eps32-ish; bf16 storage: sqrt(N)*eps_bf16 (driver gates)
    gate = 1e-4 if dtype == jnp.float32 else n**0.5 * 2e-4
    log(f"freivalds {res:.2e} {'PASS' if res < gate else 'FAIL'} "
        f"(gate {gate}, {time.perf_counter() - t0:.1f}s)")
    emit({
        "path": "potrf_packed", "n": n, "tb": tb,
        "precision": precision, "dtype": jnp.dtype(dtype).name,
        "trailing": trailing, "t_s": round(t_fact, 2),
        "gflops": round(gf, 1), "freivalds": res,
        "packed_gib": round(gib, 2),
    })
    if not do_potri:
        del lp
        return
    pinv = jax.jit(lambda p: potri_packed(p, n, tb), donate_argnums=0)
    t0 = time.perf_counter()
    sp = pinv(lp)
    _ = float(sp[0, 0])
    log(f"potri_packed cold: {time.perf_counter() - t0:.1f}s")
    emit({
        "path": "potri_packed", "n": n, "tb": tb,
        "t_cold_s": round(time.perf_counter() - t0, 1),
        "packed_gib": round(gib, 2),
    })
    if do_serve:
        serve_rows(
            lambda op, b: solve_inverse_packed(op, b, n, tb), sp, n, tb,
            f"inverse_packed_n{n}", packed=True,
        )
    del sp


def trailing_ab(n, tb, dtype, kb):
    """A/B the packed trailing backends at a frontier size: the XLA
    per-column loop (2 reads + 2 writes per trailing element per step)
    vs the aliased single-pass Pallas kernel."""
    from dla_tpu.algos.packed import (
        freivalds_packed, plgsy_packed, potrf_packed,
    )

    isz = jnp.dtype(dtype).itemsize
    gib = n * (n + tb) / 2 * isz / 2**30
    log(f"=== trailing A/B N={n} tb={tb} dtype={jnp.dtype(dtype).name} "
        f"kb={kb} packed={gib:.1f} GiB")
    gen = jax.jit(lambda: plgsy_packed(n, tb, seed=7, dtype=dtype))
    for backend in ("xla", "pallas"):
        kw = dict(precision="default")
        if backend == "pallas":
            kw.update(trailing="pallas", ktb=1024, kb=kb)
        fact = jax.jit(
            lambda p: potrf_packed(p, n, tb, **kw), donate_argnums=0
        )
        times = []
        res = None
        for it in range(3):
            ap = gen()
            _ = float(ap[0, 0])
            t0 = time.perf_counter()
            lp = fact(ap)
            _ = float(lp[0, 0])
            dt_s = time.perf_counter() - t0
            times.append(dt_s)
            log(f"[{backend}] iter {it}: {dt_s:.2f}s = "
                f"{n**3 / 3 / dt_s / 1e9:.0f} GF/s")
            if it == 2:
                res = float(jax.jit(
                    lambda p: freivalds_packed(p, n, tb, seed=7, key=1)
                )(lp))
            del lp
        t = sorted(times)[1]
        gf = n**3 / 3 / t / 1e9
        gate = 1e-4 if dtype == jnp.float32 else n**0.5 * 2e-4
        log(f"[{backend}] median {t:.2f}s = {gf:.0f} GF/s, freivalds "
            f"{res:.2e} {'PASS' if res < gate else 'FAIL'}")
        emit({
            "path": f"potrf_packed_trailing_{backend}", "n": n, "tb": tb,
            "dtype": jnp.dtype(dtype).name, "kb": kb,
            "t_s": round(t, 2), "gflops": round(gf, 1), "freivalds": res,
        })


def ktb_sweep(n, tb, dtype, ktbs, vmem_mb=100):
    """Kernel-tile (ktb) sensitivity of the pallas packed trailing at a
    frontier size — the dense trailing study found tb=1024 optimal for
    f32 (2048 fails Mosaic VMEM at 100 MB) and bf16 tb=2048 compiles
    but loses ~10% (STATUS_r3 session 2); check whether that transfers
    to the packed kernel's block-coordinate grid."""
    from dla_tpu.algos.packed import (
        freivalds_packed, plgsy_packed, potrf_packed,
    )

    gen = jax.jit(lambda: plgsy_packed(n, tb, seed=7, dtype=dtype))
    for ktb in ktbs:
        log(f"=== ktb sweep N={n} tb={tb} dtype={jnp.dtype(dtype).name} "
            f"ktb={ktb}")
        try:
            fact = jax.jit(
                lambda p, _k=ktb: potrf_packed(
                    p, n, tb, precision="default", trailing="pallas",
                    ktb=_k, kb=tb),
                donate_argnums=0,
            )
            times = []
            res = None
            for it in range(3):
                ap = gen()
                _ = float(ap[0, 0])
                t0 = time.perf_counter()
                lp = fact(ap)
                _ = float(lp[0, 0])
                times.append(time.perf_counter() - t0)
                if it == 2:
                    res = float(jax.jit(
                        lambda p: freivalds_packed(p, n, tb, seed=7, key=1)
                    )(lp))
                del lp
            t = sorted(times)[1]
            gf = n**3 / 3 / t / 1e9
            log(f"[ktb={ktb}] median {t:.2f}s = {gf:.0f} GF/s, "
                f"freivalds {res:.2e}")
            emit({"path": "potrf_packed_ktb", "n": n, "tb": tb,
                  "dtype": jnp.dtype(dtype).name, "ktb": ktb,
                  "t_s": round(t, 2), "gflops": round(gf, 1),
                  "freivalds": res})
        except Exception as e:  # noqa: BLE001 — record VMEM/compile fails
            log(f"[ktb={ktb}] FAILED: {type(e).__name__}: {str(e)[:200]}")
            emit({"path": "potrf_packed_ktb", "n": n, "tb": tb,
                  "dtype": jnp.dtype(dtype).name, "ktb": ktb, "rc": 1,
                  "error": str(e)[:160]})


def high_probe(n, tb, kb):
    """Packed HIGH (bf16x3) tier at the small-NB frontier config. Campaign
    M measured packed high only at NB=4096 kb=4096 (33.9 TF/s) — the
    config the DENSE high tier also loses at (49.0 vs 53.7 TF/s at
    NB=2048; STATUS_r3 kb table). The dense high frontier is NB=1024
    kb=1024, and the high-tier rate rose monotonically with N to its
    in-core limit 61440 (59.5 TF/s = 94.5% of ceiling) — packed f32
    reaches N=81920, so a packed high run at the frontier NB probes
    whether the headline extends past the dense memory bound."""
    from dla_tpu.algos.packed import (
        freivalds_packed, plgsy_packed, potrf_packed,
    )

    gib = n * (n + tb) / 2 * 4 / 2**30
    log(f"=== packed HIGH probe N={n} tb={tb} kb={kb} "
        f"packed={gib:.1f} GiB")
    gen = jax.jit(lambda: plgsy_packed(n, tb, seed=7, dtype=jnp.float32))
    try:
        fact = jax.jit(
            lambda p: potrf_packed(p, n, tb, precision="high",
                                   trailing="pallas", ktb=1024, kb=kb),
            donate_argnums=0,
        )
        times = []
        res = None
        for it in range(3):
            ap = gen()
            _ = float(ap[0, 0])
            t0 = time.perf_counter()
            lp = fact(ap)
            _ = float(lp[0, 0])
            dt_s = time.perf_counter() - t0
            times.append(dt_s)
            log(f"[high tb={tb}] iter {it}: {dt_s:.2f}s = "
                f"{n**3 / 3 / dt_s / 1e9:.0f} GF/s")
            if it == 2:
                res = float(jax.jit(
                    lambda p: freivalds_packed(p, n, tb, seed=7, key=1)
                )(lp))
            del lp
        t = sorted(times)[1]
        gf = n**3 / 3 / t / 1e9
        log(f"[high N={n} tb={tb} kb={kb}] median {t:.2f}s = {gf:.0f} "
            f"GF/s, freivalds {res:.2e} "
            f"{'PASS' if res < 1e-4 else 'FAIL'}")
        emit({"path": "potrf_packed_high", "n": n, "tb": tb, "kb": kb,
              "dtype": "float32", "trailing": "pallas",
              "t_s": round(t, 2), "gflops": round(gf, 1),
              "freivalds": res, "packed_gib": round(gib, 2)})
    except Exception as e:  # noqa: BLE001 — record compile/OOM frontier
        log(f"[high N={n} tb={tb}] FAILED: {type(e).__name__}: "
            f"{str(e)[:300]}")
        emit({"path": "potrf_packed_high", "n": n, "tb": tb, "kb": kb,
              "dtype": "float32", "trailing": "pallas", "rc": 1,
              "error": str(e)[:200]})


def main():
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"backend={jax.default_backend()} chain={CHAIN} phases={PHASES}")
    t0 = time.perf_counter()
    _ = float(jnp.linalg.norm(jnp.ones((256, 256), jnp.float32)))
    log(f"device warmup (first-contact): {time.perf_counter() - t0:.1f}s")

    nb_front = int(os.environ.get("PACKED_N_B", 65536))
    tb_front = int(os.environ.get("PACKED_TB_B", 4096))
    if "A" in PHASES:
        phase_a()
    if "B" in PHASES:
        frontier(nb_front, tb_front, "default")
    if "C" in PHASES:
        frontier(73728, 4096, "default")
    if "D" in PHASES:
        frontier(81920, 4096, "default", do_potri=False)
    if "E" in PHASES:
        # bf16 packed: extends the bf16 in-core frontier past the dense
        # limit N=65536 (STATUS_r3: 81920 dense bf16 fits but measured
        # flat-to-down; packed reaches sizes dense bf16 cannot hold)
        frontier(98304, 4096, "default", do_potri=False,
                 dtype=jnp.bfloat16)
    if "F" in PHASES:
        frontier(106496, 4096, "default", do_potri=False,
                 dtype=jnp.bfloat16)
    if "V" in PHASES:
        ktb_sweep(65536, 4096, jnp.float32, (512, 2048))
    if "W" in PHASES:
        ktb_sweep(98304, 4096, jnp.bfloat16, (2048,))
    if "P" in PHASES:
        trailing_ab(65536, 4096, jnp.float32, 4096)
    if "Q" in PHASES:
        trailing_ab(98304, 4096, jnp.bfloat16, 4096)
    # pallas-trailing frontier reruns (the A/B covered 65536f32/98304bf16)
    if "R" in PHASES:
        frontier(73728, 4096, "default", do_potri=False,
                 trailing="pallas")
        frontier(81920, 4096, "default", do_potri=False,
                 trailing="pallas")
    if "S" in PHASES:
        frontier(106496, 4096, "default", do_potri=False,
                 dtype=jnp.bfloat16, trailing="pallas")
    # stretch retries: the XLA per-column program crashed the remote
    # compile helper at these sizes (STATUS_r3 session 10); the pallas
    # path is one kernel per step — a far smaller program
    if "T" in PHASES:
        try:
            frontier(86016, 4096, "default", do_potri=False,
                     trailing="pallas")
        except Exception as e:  # noqa: BLE001
            log(f"[stretch T] FAILED: {type(e).__name__}: {str(e)[:300]}")
            emit({"path": "potrf_packed", "n": 86016, "tb": 4096,
                  "dtype": "float32", "trailing": "pallas", "rc": 1,
                  "error": str(e)[:200]})
    if "U" in PHASES:
        try:
            frontier(114688, 4096, "default", do_potri=False,
                     dtype=jnp.bfloat16, trailing="pallas")
        except Exception as e:  # noqa: BLE001
            log(f"[stretch U] FAILED: {type(e).__name__}: {str(e)[:300]}")
            emit({"path": "potrf_packed", "n": 114688, "tb": 4096,
                  "dtype": "bfloat16", "trailing": "pallas", "rc": 1,
                  "error": str(e)[:200]})
    if "G" in PHASES:
        # stretch rows — expected to sit right at the HBM edge; a clean
        # OOM row is the frontier evidence (campaign convention)
        try:
            frontier(114688, 4096, "default", do_potri=False,
                     dtype=jnp.bfloat16)
        except Exception as e:  # noqa: BLE001 — record the OOM frontier
            log(f"[stretch G] FAILED: {type(e).__name__}: {str(e)[:300]}")
            emit({"path": "potrf_packed", "n": 114688, "tb": 4096,
                  "dtype": "bfloat16", "rc": 1,
                  "error": str(e)[:200]})
    if "H" in PHASES:
        try:
            frontier(86016, 4096, "default", do_potri=False)
        except Exception as e:  # noqa: BLE001
            log(f"[stretch H] FAILED: {type(e).__name__}: {str(e)[:300]}")
            emit({"path": "potrf_packed", "n": 86016, "tb": 4096,
                  "dtype": "float32", "rc": 1,
                  "error": str(e)[:200]})
    # packed HIGH at the dense frontier NB (session 13: untried — campaign
    # M's 33.9 TF/s was at NB=4096 full-K, where dense high loses too)
    if "X" in PHASES:
        high_probe(65536, 1024, 1024)
    if "Y" in PHASES:
        high_probe(81920, 1024, 1024)
    if "Z" in PHASES:
        high_probe(81920, 2048, 1024)
    log("done")


if __name__ == "__main__":
    main()
