"""Regenerate the multi-chip crossover projections artifact
(``results_r3/projections.json``) from the scaling model.

The model (``dla_tpu/parallel/model.py``) answers the reference's
"when does offload pay" question (SURVEY §6: hybrid ≥ CPU-only only for
N ≥ ~12000) for the multi-chip analogue: comm volumes are HLO-validated
(tests/test_model.py), the per-device compute rate is the *measured*
single-chip curve evaluated at the device-local scale.

Run:  python benchmarks/projections_r3.py
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from dla_tpu.parallel.model import crossover_n  # noqa: E402

OUT = os.path.join(REPO, "benchmarks", "results_r3", "projections.json")


def main():
    rows = []
    for chip in ("v5e", "v5p"):
        for p, q in ((2, 2), (2, 4), (4, 4)):
            r = crossover_n(p, q, chip=chip)
            by_n = {c["n"]: c for c in r["curve"]}

            def at(n, key):
                c = by_n.get(n)
                return round(c[key], 3) if c else None

            rows.append({
                "chip": chip,
                "mesh": r["mesh"],
                "nb": r["nb"],
                "crossover_n": r["crossover_n"],
                "n_eff50": r["n_eff50"],
                "n_eff70": r["n_eff70"],
                "speedup_at_65536": at(65536, "speedup"),
                "speedup_at_131072": at(131072, "speedup"),
                "efficiency_at_131072": at(131072, "efficiency"),
                "comm_fraction_at_131072": at(131072, "comm_fraction"),
            })
            print(rows[-1])
    with open(OUT, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"wrote {OUT}")




def oocore():
    """Config-5 (N=262144) out-of-core projection artifact."""
    from dla_tpu.parallel.model import (
        project_oocore_host,
        project_oocore_mesh,
    )

    out = os.path.join(REPO, "benchmarks", "results_r3",
                       "oocore_projection.json")
    host = project_oocore_host(163840, 4096)
    rows = {
        "host_validation_n163840": {
            "modeled_s": round(host["t_total_s"], 1),
            "measured_s": 21129.0,
            "modeled_gflops": round(host["gflops"], 1),
            "measured_gflops": 69.4,
        },
        "config5_n262144": [],
    }
    for p, q in ((1, 1), (2, 2), (2, 4), (4, 4)):
        for bw in (32.0, 100.0):
            m = project_oocore_mesh(262144, 4096, p, q, host_bw_gbps=bw)
            rows["config5_n262144"].append({
                k: (round(v, 3) if isinstance(v, float) else v)
                for k, v in m.items()
            })
            print(rows["config5_n262144"][-1])
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"wrote {out}")


def packed():
    """Packed × multi-chip projection artifact (ROADMAP r4 2b, model half):
    the flat-mesh packed column-cyclic data plane
    (parallel/packed_cyclic.py) projected onto meshes this environment
    does not have. nb is fixed at 4096 — the MEASURED packed single-chip
    frontier NB (STATUS_r3 session 10/11); the model's per-device rate
    term is the measured tier curve and is nb-independent, so smaller-nb
    rows would double-count the envelope-overhead saving without paying
    the (unmeasured) narrower-GEMM cost."""
    from dla_tpu.parallel.model import packed_crossover, packed_mesh_max_n

    out = os.path.join(REPO, "benchmarks", "results_r3",
                       "packed_projection.json")
    art = {"memory_unlock": [], "crossovers": []}
    for itemsize in (4, 2):
        for ndev in (1, 2, 4, 8, 16):
            m = packed_mesh_max_n(ndev, itemsize=itemsize)
            art["memory_unlock"].append(m)
            print({k: m[k] for k in
                   ("ndev", "itemsize", "max_n_packed", "max_n_dense")})
    for tier, itemsize in (("default", 4), ("bf16", 2)):
        for ndev in (2, 4, 8):
            c = packed_crossover(ndev, tier=tier, itemsize=itemsize)
            am = c["at_mesh_max"]
            art["crossovers"].append({
                "ndev": ndev, "tier": tier, "nb": c["nb"],
                "itemsize": itemsize,
                "crossover_n": c["crossover_n"],
                "n_eff50": c["n_eff50"],
                "n_eff70": c["n_eff70"],
                "mesh_max_n": c["mesh_max_n"],
                "gflops_at_mesh_max": round(am["dist_gflops"], 1),
                "speedup_at_mesh_max": round(am["speedup"], 3),
                "comm_fraction_at_mesh_max": round(am["comm_fraction"], 3),
                "flop_ratio_at_mesh_max": round(am["flop_ratio"], 3),
                "single_chip_fits_at_mesh_max": am["single_chip_fits"],
            })
            print(art["crossovers"][-1])
    with open(out, "w") as f:
        json.dump(art, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
    oocore()
    packed()
