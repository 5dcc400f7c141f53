"""Plotting layer — parity with the reference's matplotlib scripts.

- :func:`plot_perf_grid` ↔ ``plot_grid_all.py``: per-(device-config) grid of
  GFLOP/s-vs-N curves, one line per NB, filtered to ``exit_code == 0``
  (``plot_grid_all.py:39``), **median over timed repeats** (run_idx > 0,
  the compile repeat excluded; the reference medians over repeats at
  ``plot_grid_all.py:45-49``), hardware-peak reference lines (vs MXU peak,
  not the reference's 243.2/300 CPU/GPU peaks — ``plot_grid_all.py:155-156``)
  and a "Best" annotation per panel (``plot_grid_all.py:117-126``).
- :func:`plot_residuals` ↔ ``plot_residuals_per_scheduler.py``: log-scale
  residual-vs-N per config — with mapping names that actually match the CSV
  (the reference's don't: SURVEY Appendix A).
"""

from __future__ import annotations

import os

import pandas as pd

# Measured per-precision matmul ceilings on this v5e (chained-GEMM probe,
# results/micro2_r2.jsonl, RTT-corrected): default = 1-pass bf16,
# high = 3-pass bf16x3, highest = true-fp32 6-pass. Override via env.
DEFAULT_PEAK_GFLOPS = float(os.environ.get("DLA_TPU_PEAK_GFLOPS", 3.14e4))
PEAK_BY_PRECISION = {
    "default": 1.82e5,
    "high": 6.31e4,
    "highest": 3.14e4,
}


def load_bench_csv(path) -> pd.DataFrame:
    """Load one CSV, a comma-separated list, or a sequence of paths
    (campaigns may span schema revisions — e.g. the late-r3 ``kb`` column
    — so frames are concatenated with missing columns left as NaN)."""
    paths = (
        path.split(",") if isinstance(path, str) else list(path)
    )
    df = pd.concat([pd.read_csv(p) for p in paths], ignore_index=True)
    df = df[df["exit_code"] == 0]
    df = df[df["gflops"].notna()]
    return df


def median_over_repeats(df: pd.DataFrame) -> pd.DataFrame:
    """Median GFLOP/s over timed repeats (run_idx > 0 excludes the
    compile/calibration repeat)."""
    timed = df[df["run_idx"] > 0]
    group_cols = [
        c
        for c in ("mode", "mesh", "dtype", "precision", "kb", "N", "NB")
        if c in timed
    ]
    return (
        # dropna=False: merged frames have NaN kb on pre-kb-column rows —
        # those rows must still aggregate, not silently vanish
        timed.groupby(group_cols, as_index=False, dropna=False)
        .agg(gflops=("gflops", "median"), rel_error=("rel_error", "median"))
    )


def plot_perf_grid(
    csv_path: str,
    out_path: str = "results/perf_grid.png",
    *,
    peak_gflops: float = DEFAULT_PEAK_GFLOPS,
):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    df = median_over_repeats(load_bench_csv(csv_path))
    if "precision" not in df:
        df = df.assign(precision="highest")
    if "device" not in df:
        df = df.assign(device="tpu")
    configs = sorted(
        df.groupby(["mode", "mesh", "dtype", "precision", "device"]).groups
    )
    ncols = max(1, len(configs))
    fig, axes = plt.subplots(1, ncols, figsize=(6 * ncols, 4.5), squeeze=False)
    for ax, key in zip(axes[0], configs):
        mode, mesh, dtype, prec, device = key
        sub = df[
            (df["mode"] == mode) & (df["mesh"] == mesh)
            & (df["dtype"] == dtype) & (df["precision"] == prec)
            & (df["device"] == device)
        ]
        # MXU peak-fraction annotations only make sense on the real chip;
        # virtual-CPU (distributed-correctness) panels get none.
        peak = (
            PEAK_BY_PRECISION.get(str(prec), peak_gflops)
            if device != "cpu" else None
        )
        for nb, g in sub.groupby("NB"):
            g = g.sort_values("N")
            ax.plot(g["N"], g["gflops"], marker="o", label=f"NB={nb}")
        if len(sub):
            best = sub.loc[sub["gflops"].idxmax()]
            frac = f" = {best['gflops'] / peak:.0%} of peak" if peak else ""
            ax.annotate(
                f"Best: {best['gflops']:.0f} GF/s{frac}\n"
                f"(N={best['N']}, NB={best['NB']})",
                xy=(best["N"], best["gflops"]),
                xytext=(0.45, 0.15),
                textcoords="axes fraction",
                arrowprops={"arrowstyle": "->"},
            )
        if peak:
            ax.axhline(peak, ls="--", c="gray", lw=1,
                       label=f"MXU peak ({prec})")
        ax.set_title(f"{mode} {mesh} {dtype} {prec} [{device}]")
        ax.set_xlabel("N")
        ax.set_ylabel("GFLOP/s")
        ax.legend(fontsize=7)
    fig.tight_layout()
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


def plot_serving(
    jsonl_paths,
    out_path: str = "results/solve_serving.png",
    *,
    ceiling_gflops: float = 63000.0,
):
    """Serving characterization figure from the solve-path jsonl artifacts
    (``solve_serving_sweep.jsonl`` / ``solve_latency_probe.jsonl`` /
    ``solve_serving_n65536.jsonl``): RHS columns/s and GF/s vs the RHS
    block width, one series per (path, N), with the high-tier kernel
    ceiling for scale. The reference has no solve-path plot to mirror —
    this follows the perf-grid house style."""
    import json as _json

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rows = []
    for p in jsonl_paths:
        with open(p) as f:
            for line in f:
                line = line.strip()
                if line:
                    rows.append(_json.loads(line))
    df = pd.DataFrame(rows)
    if "path" not in df:
        df = df.assign(path="potrs")
    df["path"] = df["path"].fillna("potrs")
    # the latency probe sweeps ib for potrs; keep the shipping default
    if "ib" in df:
        df = df[(df["path"] != "potrs") | df["ib"].isna()
                | (df["ib"] == 512)]
    df = (
        df.groupby(["path", "n", "nrhs"], as_index=False)
        .agg({"rhs_cols_per_s": "max", "gflops": "max"})
    )
    fig, axes = plt.subplots(1, 2, figsize=(11, 4.5))
    for (path, n), g in df.groupby(["path", "n"]):
        g = g.sort_values("nrhs")
        for ax, col in zip(axes, ("rhs_cols_per_s", "gflops")):
            ax.plot(g["nrhs"], g[col], marker="o", label=f"{path} N={n}")
    axes[1].axhline(ceiling_gflops, ls="--", c="gray", lw=1,
                    label="high-tier kernel ceiling")
    for ax, ylab in zip(axes, ("RHS columns/s", "GFLOP/s (2·N²·NRHS)")):
        ax.set_xscale("log", base=2)
        ax.set_xlabel("NRHS (RHS block width)")
        ax.set_ylabel(ylab)
        ax.legend(fontsize=7)
    axes[0].set_title("serving throughput from a resident factor")
    axes[1].set_title("solve rate vs the factor kernel ceiling")
    fig.tight_layout()
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


def plot_residuals(csv_path: str, out_path: str = "results/residuals.png"):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    df = load_bench_csv(csv_path)
    df = df[df["rel_error"].notna() & (df["run_idx"] > 0)]
    configs = sorted(df.groupby(["mode", "dtype"]).groups)
    ncols = max(1, len(configs))
    fig, axes = plt.subplots(1, ncols, figsize=(5 * ncols, 4), squeeze=False)
    for ax, key in zip(axes[0], configs):
        mode, dtype = key
        sub = df[(df["mode"] == mode) & (df["dtype"] == dtype)]
        for nb, g in sub.groupby("NB"):
            med = g.groupby("N", as_index=False)["rel_error"].median()
            ax.semilogy(med["N"], med["rel_error"], marker="s", label=f"NB={nb}")
        ax.axhline(1e-10, ls=":", c="red", lw=1, label="1e-10 gate")
        ax.set_title(f"residual — {mode} {dtype}")
        ax.set_xlabel("N")
        ax.set_ylabel("||A-LL^T||/||A||")
        ax.legend(fontsize=7)
    fig.tight_layout()
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


def main(argv=None) -> int:
    import argparse

    ap = argparse.ArgumentParser(prog="dla-bench-plots")
    ap.add_argument("csv", nargs="+",
                    help="one or more bench CSVs (merged for plotting)")
    ap.add_argument("--out-dir", default="results")
    ap.add_argument("--peak", type=float, default=DEFAULT_PEAK_GFLOPS)
    args = ap.parse_args(argv)
    p1 = plot_perf_grid(
        args.csv, os.path.join(args.out_dir, "perf_grid.png"), peak_gflops=args.peak
    )
    p2 = plot_residuals(args.csv, os.path.join(args.out_dir, "residuals.png"))
    print(p1)
    print(p2)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
