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


if __name__ == "__main__":
    main()
