"""Benchmark sweep harness — the TPU-native ``benchmark.c``.

Reproduces the reference harness's semantics (``benchmark.c:69-298``):

- a config matrix swept as N × NB × device-config × repeats — but the matrix
  lives in a JSON profile (or kwargs), not recompiled C arrays
  (``benchmark.c:76-101``, SURVEY §5.6);
- **subprocess isolation per run**: each measurement fork/execs the driver
  CLI so a crash/misconfig can't poison the sweep (the reference pipes and
  parses the child's stdout — ``benchmark.c:229-271`` — and so do we);
- repeat 0 is the warm-up/compile repeat, the ``STARPU_CALIBRATE=1``
  analogue (``benchmark.c:201``) — on TPU it pays the XLA compile; it is
  recorded with ``run_idx=0`` like the reference and excluded from medians
  by the plot layer (``plot_grid_all.py:45-49`` behavior);
- the child's ``Performance:`` / residual lines are the parse contract
  (``benchmark.c:45-67``);
- CSV rows appended incrementally so interrupted sweeps resume
  (``fopen "a"`` — ``benchmark.c:109``); schema is the reference's
  ``timestamp,scheduler,mapping,ncpu,ngpu,N,NB,run_idx,ms,exit_code,gflops,
  rel_error`` (``benchmark.c:114``) extended with ``device,mesh,dtype,mode``
  (scheduler is always "xla-static": the dynamic scheduler dimension
  disappears by design — SURVEY §1 L1);
- ANSI-colored progress with ``NO_COLOR`` support (``benchmark.c:18-21``).
"""

from __future__ import annotations

import csv
import dataclasses
import datetime
import json
import os
import re
import subprocess
import sys
import time
from typing import Iterable, Sequence

from dla_tpu.utils.precision import DEFAULT as _LIB_DEFAULT

CSV_COLUMNS = [
    "timestamp",
    "scheduler",
    "mapping",
    "ncpu",
    "ngpu",
    "N",
    "NB",
    "run_idx",
    "ms",
    "exit_code",
    "gflops",
    "rel_error",
    # extensions over the reference schema:
    "device",
    "mesh",
    "dtype",
    "mode",
    "precision",
    "kb",  # trailing-update k-split (late-r3 frontier axis; "" = default)
    "retries",  # transient-failure re-executions consumed (ArmoniK
    # max_retries parity, client_distrib.cpp:335-337; "" = none)
]

_PERF_RE = re.compile(r"Performance:\s*([0-9.eE+-]+)\s*Gflop/s")
_REPEAT_RE = re.compile(r"Repeat (\d+): ([0-9.eE+-]+) ms ([0-9.eE+-]+) Gflop/s")
_RES_RE = re.compile(r"\|\|A - LL\^T\|\|_inf / \|\|A\|\|_inf\s*=\s*([0-9.eE+-]+)")
# in-core-frontier configs validate matrix-free (driver's device-Freivalds
# fallback — same probe/gate contract as the out-of-core path); its residual
# fills rel_error when the exact-reconstruction line is absent
_FREIVALDS_RE = re.compile(
    r"freivalds \|\|\(A - LL\^T\)x\|\| / \(\|\|A\|\| \|\|x\|\|\)\s*=\s*([0-9.eE+-]+)"
)
_ELAPSED_RE = re.compile(r"Elapsed:\s*([0-9.eE+-]+)\s*ms")


def _color(code: str, s: str) -> str:
    if os.environ.get("NO_COLOR"):
        return s
    return f"\x1b[{code}m{s}\x1b[0m"


@dataclasses.dataclass(frozen=True)
class SweepConfig:
    """One sweep campaign (the JSON-profile replacement for the compiled-in
    tables at ``benchmark.c:76-101``)."""

    ns: Sequence[int] = (1024, 4096, 8192)
    nbs: Sequence[int] = (128, 256, 512)
    dtypes: Sequence[str] = ("float32",)
    modes: Sequence[str] = ("blocked",)
    meshes: Sequence[tuple[int, int]] = ((1, 1),)
    repeats: int = 8  # repeat 0 = warm-up/compile (calibration analogue)
    platform: str | None = None
    gen: str = "plgsy"
    panel: str = "xla"
    trailing: str = "xla"
    timeout_s: float = 900.0
    max_retries: int = 3  # per-run retry budget (ArmoniK TaskOptions parity,
    # client_distrib.cpp:335-337); a crashed/timed-out child is re-executed
    precision: str | None = None  # matmul tier (None = library default)
    kb: int | None = None  # trailing k-split (shrink/inplace; None = default)
    diag: str = "lax"  # diagonal-block factor backend
    inproc_repeats: bool = True  # one fork per CONFIG with --repeats timed
    # runs inside (a fork per repeat — the reference's layout — would pay
    # the full remote XLA compile on every repeat; repeat 0 stays the
    # compile/calibration row either way)

    @classmethod
    def from_json(cls, path: str) -> "SweepConfig":
        with open(path) as f:
            d = json.load(f)
        if "meshes" in d:
            d["meshes"] = [tuple(m) for m in d["meshes"]]
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})


def parse_metrics(stdout: str) -> tuple[float | None, float | None, float | None]:
    """Extract (gflops, rel_error, elapsed_ms) from driver stdout — the same
    text contract the reference harness greps (``benchmark.c:45-67``)."""
    perf = _PERF_RE.search(stdout)
    res = _RES_RE.search(stdout) or _FREIVALDS_RE.search(stdout)
    ms = _ELAPSED_RE.search(stdout)
    return (
        float(perf.group(1)) if perf else None,
        float(res.group(1)) if res else None,
        float(ms.group(1)) if ms else None,
    )


def parse_repeats(stdout: str) -> list[tuple[int, float, float]]:
    """Extract (run_idx, ms, gflops) per in-process repeat line."""
    return [
        (int(m.group(1)), float(m.group(2)), float(m.group(3)))
        for m in _REPEAT_RE.finditer(stdout)
    ]


def _driver_cmd(n, nb, dtype, mode, mesh, gen, platform, panel="xla", trailing="xla",
                precision=None, diag="lax", repeats=1, kb=None) -> list[str]:
    cmd = [
        sys.executable,
        "-m",
        "dla_tpu.cli.potrf_driver",
        "--n",
        str(n),
        "--nb",
        str(nb),
        "--dtype",
        dtype,
        "--mode",
        mode,
        "--gen",
        gen,
    ]
    if mode in ("blocked", "shrink"):
        cmd += ["--panel", panel, "--trailing", trailing]
    if mode in ("packed", "df64") and trailing != "xla":
        cmd += ["--trailing", trailing]  # df64: the fused pass-loop kernel
    if mode in ("blocked", "shrink", "inplace", "packed"):
        cmd += ["--diag", diag]
        if precision:
            cmd += ["--precision", precision]
    if kb and mode in ("shrink", "inplace", "packed"):
        cmd += ["--kb", str(kb)]
    if mode == "distributed":
        cmd += ["--p", str(mesh[0]), "--q", str(mesh[1])]
    if platform:
        cmd += ["--platform", platform]
    if repeats > 1:
        cmd += ["--repeats", str(repeats)]
    return cmd


def run_sweep(
    cfg: SweepConfig,
    csv_path: str = "results/bench.csv",
    *,
    env: dict | None = None,
    echo: bool = True,
) -> list[dict]:
    """Run the sweep, appending one CSV row per (config, repeat).

    Returns the list of row dicts. Resumable: rows already present in the
    CSV (same N, NB, dtype, mode, mesh, run_idx) are skipped, which is the
    behavior the reference achieved with append-mode CSVs across harness
    restarts (SURVEY §5.3).
    """
    os.makedirs(os.path.dirname(csv_path) or ".", exist_ok=True)
    done: set[tuple] = set()
    header: list[str] | None = None
    if os.path.exists(csv_path):
        with open(csv_path) as f:
            reader = csv.DictReader(f)
            header = reader.fieldnames and list(reader.fieldnames)
            for row in reader:
                done.add(
                    (
                        int(row["N"]),
                        int(row["NB"]),
                        row.get("dtype", ""),
                        row.get("mode", ""),
                        row.get("mesh", ""),
                        row.get("precision", _LIB_DEFAULT) or _LIB_DEFAULT,
                        row.get("kb", "") or "",
                        int(row["run_idx"]),
                    )
                )
    new_file = not os.path.exists(csv_path) or os.path.getsize(csv_path) == 0
    rows: list[dict] = []
    with open(csv_path, "a", newline="") as f:
        # appending to a pre-kb-column CSV keeps that file's schema (the
        # kb field is dropped); fresh files get the full current schema
        writer = csv.DictWriter(
            f, fieldnames=header or CSV_COLUMNS, extrasaction="ignore"
        )
        if new_file:
            writer.writeheader()
            f.flush()
        for dtype in cfg.dtypes:
            for mode in cfg.modes:
                for mesh in cfg.meshes if mode == "distributed" else [(1, 1)]:
                    for n in cfg.ns:
                        for nb in cfg.nbs:
                            if n % nb:
                                continue
                            if mode == "distributed" and (
                                (n // nb) % mesh[0] or (n // nb) % mesh[1]
                            ):
                                continue
                            prec_key = cfg.precision or _LIB_DEFAULT
                            kb_key = str(cfg.kb) if cfg.kb else ""
                            if cfg.inproc_repeats and cfg.repeats > 1:
                                key = (n, nb, dtype, mode,
                                       f"{mesh[0]}x{mesh[1]}", prec_key,
                                       kb_key, 0)
                                if key in done:
                                    continue
                                new = _run_config_inproc(
                                    cfg, n, nb, dtype, mode, mesh, env
                                )
                            else:
                                new = []
                                for rep in range(cfg.repeats):
                                    key = (n, nb, dtype, mode,
                                           f"{mesh[0]}x{mesh[1]}", prec_key,
                                           kb_key, rep)
                                    if key in done:
                                        continue
                                    new.append(_run_one(
                                        cfg, n, nb, dtype, mode, mesh, rep, env
                                    ))
                            for row in new:
                                writer.writerow(row)
                                f.flush()
                                rows.append(row)
                                if echo:
                                    ok = row["exit_code"] == 0
                                    tag = (
                                        _color("32", "ok")
                                        if ok
                                        else _color("31", f"rc={row['exit_code']}")
                                    )
                                    print(
                                        f"[sweep] N={n} NB={nb} {dtype} {mode} "
                                        f"mesh={mesh[0]}x{mesh[1]} "
                                        f"rep={row['run_idx']}: "
                                        f"{row['gflops']} GF/s "
                                        f"res={row['rel_error']} {tag}",
                                        flush=True,
                                    )
    return rows


def _base_row(cfg, n, nb, dtype, mode, mesh, rep) -> dict:
    return {
        "timestamp": datetime.datetime.now().isoformat(timespec="seconds"),
        "scheduler": "xla-static",
        "mapping": "tpu-chip" if cfg.platform != "cpu" else "cpu-sim",
        "ncpu": 0,
        "ngpu": 0,
        "N": n,
        "NB": nb,
        "run_idx": rep,
        "ms": "",
        "exit_code": 0,
        "gflops": "",
        "rel_error": "",
        "device": cfg.platform or "tpu",
        "mesh": f"{mesh[0]}x{mesh[1]}",
        "dtype": dtype,
        "mode": mode,
        "precision": cfg.precision or _LIB_DEFAULT,
        "kb": cfg.kb if cfg.kb else "",
        "retries": "",
    }


def _run_config_inproc(cfg, n, nb, dtype, mode, mesh, env) -> list[dict]:
    """One fork for the whole config; one CSV row per in-process repeat
    (run_idx 0 = the compile/calibration repeat, like the reference)."""
    cmd = _driver_cmd(
        n, nb, dtype, mode, mesh, cfg.gen, cfg.platform, cfg.panel,
        cfg.trailing, cfg.precision, cfg.diag, cfg.repeats - 1, kb=cfg.kb,
    )
    run_env = dict(os.environ)
    if cfg.platform == "cpu":
        # CPU-only child: skip the axon TPU plugin registration entirely
        # (slow/flaky over the tunnel, and it overrides platform selection);
        # give distributed-mode children a big-enough virtual device fleet
        run_env["PALLAS_AXON_POOL_IPS"] = ""
        run_env["JAX_PLATFORMS"] = "cpu"
        ndev = max(8, mesh[0] * mesh[1])
        run_env["XLA_FLAGS"] = (
            run_env.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={ndev}"
        ).strip()
    if env:
        run_env.update(env)
    exit_code, out, err = 1, "", ""
    retries = 0
    for attempt in range(max(1, cfg.max_retries)):
        try:
            proc = subprocess.run(
                cmd, capture_output=True, text=True,
                timeout=cfg.timeout_s, env=run_env,
            )
            exit_code = proc.returncode
            out = proc.stdout
            err = proc.stderr or ""
        except subprocess.TimeoutExpired as e:
            exit_code = 124
            out = (e.stdout or b"").decode() if isinstance(e.stdout, bytes) else (e.stdout or "")
            err = (e.stderr or b"").decode() if isinstance(e.stderr, bytes) else (e.stderr or "")
            if cfg.platform != "cpu":
                # A killed TPU child likely left a remote compile in flight;
                # the single-threaded compile service keeps chewing on it
                # (poisoned for up to ~45 min — CLAUDE.md), so an immediate
                # retry would also die. Record rc=124 and move on.
                break
        if exit_code == 0:
            break
        # transient-failure retry (VERDICT r3 #7; ArmoniK max_retries=3,
        # client_distrib.cpp:335-337): a child that died with NO parsed
        # repeats is the compile-service-stall signature (rc!=0, empty
        # metrics — e.g. the remote compile helper crashing within
        # seconds); a child that FAILED a numeric gate (rc=1 but metrics
        # parsed) is deterministic and must not be retried.
        if parse_repeats(out) or attempt + 1 >= max(1, cfg.max_retries):
            break
        backoff = 20.0 * (attempt + 1)
        print(
            f"  [retry] child rc={exit_code} with no metrics (transient?) — "
            f"attempt {attempt + 2}/{cfg.max_retries} in {backoff:.0f}s",
            file=sys.stderr, flush=True,
        )
        time.sleep(backoff)
        retries += 1
    if exit_code not in (0, None):
        # surface the child's last error lines — a bare rc=1 row is
        # undiagnosable from the campaign log (the reference's fork/exec
        # harness let child stderr reach the terminal, benchmark.c:229-265)
        tail = [ln for ln in err.strip().splitlines() if ln.strip()][-4:]
        for ln in tail:
            print(f"  [child stderr] {ln[:300]}", file=sys.stderr, flush=True)
    _, res, _ = parse_metrics(out)
    reps = parse_repeats(out)
    rows = []
    if not reps:  # child died before any repeat: record one failed row
        row = _base_row(cfg, n, nb, dtype, mode, mesh, 0)
        row["exit_code"] = exit_code
        row["retries"] = retries or ""
        return [row]
    for rep, ms, gf in reps:
        row = _base_row(cfg, n, nb, dtype, mode, mesh, rep)
        row.update(ms=ms, gflops=gf, exit_code=exit_code,
                   rel_error=res if res is not None else "",
                   retries=retries or "")
        rows.append(row)
    return rows


def _run_one(cfg, n, nb, dtype, mode, mesh, rep, env) -> dict:
    cmd = _driver_cmd(
        n, nb, dtype, mode, mesh, cfg.gen, cfg.platform, cfg.panel,
        cfg.trailing, cfg.precision, cfg.diag, kb=cfg.kb,
    )
    run_env = dict(os.environ)
    if cfg.platform == "cpu":
        # CPU-only child: skip the axon TPU plugin registration entirely
        # (slow/flaky over the tunnel, and it overrides platform selection);
        # give distributed-mode children a big-enough virtual device fleet
        run_env["PALLAS_AXON_POOL_IPS"] = ""
        run_env["JAX_PLATFORMS"] = "cpu"
        ndev = max(8, mesh[0] * mesh[1])
        run_env["XLA_FLAGS"] = (
            run_env.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={ndev}"
        ).strip()
    if env:
        run_env.update(env)
    t0 = time.perf_counter()
    exit_code, out = 1, ""
    retries = 0
    for attempt in range(max(1, cfg.max_retries)):
        try:
            proc = subprocess.run(
                cmd,
                capture_output=True,
                text=True,
                timeout=cfg.timeout_s,
                env=run_env,
            )
            exit_code = proc.returncode
            out = proc.stdout
        except subprocess.TimeoutExpired as e:
            exit_code = 124
            out = (e.stdout or b"").decode() if isinstance(e.stdout, bytes) else (e.stdout or "")
            if cfg.platform != "cpu":
                # A killed TPU child likely left a remote compile in flight;
                # the single-threaded compile service keeps chewing on it, so
                # an immediate retry would also time out. Record rc=124 and
                # move on (the resumable CSV lets the config be re-run later).
                break
        if exit_code == 0:
            break
        if attempt + 1 < max(1, cfg.max_retries):
            retries += 1
    wall_ms = (time.perf_counter() - t0) * 1e3
    gf, res, ms = parse_metrics(out)
    return {
        "timestamp": datetime.datetime.now().isoformat(timespec="seconds"),
        "scheduler": "xla-static",
        "mapping": "tpu-chip" if cfg.platform != "cpu" else "cpu-sim",
        "ncpu": 0,
        "ngpu": 0,
        "N": n,
        "NB": nb,
        "run_idx": rep,
        "ms": round(ms if ms is not None else wall_ms, 3),
        "exit_code": exit_code,
        "gflops": gf if gf is not None else "",
        "rel_error": res if res is not None else "",
        "device": cfg.platform or "tpu",
        "mesh": f"{mesh[0]}x{mesh[1]}",
        "dtype": dtype,
        "mode": mode,
        "precision": cfg.precision or _LIB_DEFAULT,
        "kb": cfg.kb if cfg.kb else "",
        "retries": retries or "",
    }


def main(argv: Iterable[str] | None = None) -> int:
    import argparse

    ap = argparse.ArgumentParser(prog="dla-bench-sweep")
    ap.add_argument("--profile", help="JSON sweep profile", default=None)
    ap.add_argument("--csv", default="results/bench.csv")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--repeats", type=int, default=None)
    args = ap.parse_args(list(argv) if argv is not None else None)
    cfg = SweepConfig.from_json(args.profile) if args.profile else SweepConfig()
    if args.platform:
        cfg = dataclasses.replace(cfg, platform=args.platform)
    if args.repeats:
        cfg = dataclasses.replace(cfg, repeats=args.repeats)
    run_sweep(cfg, args.csv)
    return 0


if __name__ == "__main__":
    sys.exit(main())
