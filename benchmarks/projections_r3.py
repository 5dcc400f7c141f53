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


if __name__ == "__main__":
    main()
    oocore()
