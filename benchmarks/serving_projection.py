"""Generate the multi-chip serving projection artifact.

Writes results_r3/serving_projection.json: the projected speedup /
throughput of the row-sharded explicit-inverse serving path
(`dla_tpu.parallel.serving`) over meshes of 2-16 v5e/v5p chips, from
the measured single-chip serving-rate curve
(results_r3/solve_latency_probe.jsonl). The all-gather comm volume the
model charges is pinned to the compiled HLO in tests/test_model.py,
and tests pin this artifact to the model so the published table cannot
drift from the code.

Run: python benchmarks/serving_projection.py
"""

import json
import os

from dla_tpu.parallel.serving import project_serving

OUT = os.path.join(os.path.dirname(__file__), "results_r3",
                   "serving_projection.json")


def main():
    rows = []
    for chip in ("v5e", "v5p"):
        for n in (16384, 65536, 131072):
            for nrhs in (1, 128, 1024, 4096):
                for p in (2, 4, 8, 16):
                    r = project_serving(n, nrhs, p, chip=chip)
                    rows.append(r)
    with open(OUT, "w") as f:
        json.dump(rows, f, indent=1)
    # print the v5e summary table
    print(f"{'n':>7} {'nrhs':>5} {'p':>3} {'speedup':>8} {'eff':>6} "
          f"{'cols/s':>9} {'comm%':>6} {'1chip-holds':>11}")
    for r in rows:
        if r["chip"] != "v5e":
            continue
        print(f"{r['n']:7d} {r['nrhs']:5d} {r['p']:3d} "
              f"{r['speedup']:8.2f} {r['efficiency']:6.2f} "
              f"{r['cols_per_s']:9.0f} {100*r['comm_fraction']:5.1f}% "
              f"{str(r['single_chip_holds_ainv']):>11}")
    print(f"\nwrote {len(rows)} rows -> {OUT}")


if __name__ == "__main__":
    main()
