"""df64 mesh projection artifact (r5): when does a flat D-mesh beat one
chip at the reference's 1e-10 fp64 contract?

The direct successor to the reference's only distributed workload — its
ArmoniK DAG factors fp64 tiles across workers (worker_distrib.cpp:238,
client_distrib.cpp:506-565); the rebuild's distributed-df64 plane
(parallel/packed_cyclic.py::potrf_packed_cyclic_df64) is the same
capability on emulated fp64. This script evaluates the pinned projection
model (parallel/model.py: measured single-chip df64 curve `f64x`,
chunk-pipelined ring time law, planes=2 pair comm/residency) over mesh
sizes and writes benchmarks/results_r5/df64_mesh_projection.json.
Tests pin the artifact to the model (tests/test_model.py).

Run:  python benchmarks/df64_mesh_projection.py
"""

from __future__ import annotations

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "benchmarks", "results_r5",
                   "df64_mesh_projection.json")


def main():
    import sys

    sys.path.insert(0, REPO)
    from dla_tpu.parallel.model import (
        packed_crossover,
        packed_mesh_max_n,
        project_packed_cyclic,
    )

    nb = 4096
    art = {
        "comment": (
            "Projections (not measurements — one physical chip in this "
            "environment). Single-chip df64 rates are MEASURED "
            "(results_r4/df64_probe.jsonl + r5 record certs); the mesh "
            "side charges the Mosaic-proven ring kernel's exact time law "
            "over the traced broadcast geometry with the (hi,lo) pair "
            "stacked per hop (planes=2)."),
        "tier": "f64x",
        "memory_unlock": [],
        "crossovers": [],
    }
    for ndev in (2, 4, 8, 16):
        m = packed_mesh_max_n(ndev, nb=nb, itemsize=8)
        art["memory_unlock"].append({
            "ndev": ndev, "nb": nb, "itemsize": 8,
            "max_n_packed": m["max_n_packed"],
            "max_n_dense": m["max_n_dense"],
        })
        c = packed_crossover(ndev, tier="f64x", nb=nb, itemsize=4,
                             planes=2)
        art["crossovers"].append({
            "ndev": ndev, "tier": "f64x", "nb": nb, "itemsize": 4,
            "planes": 2,
            "crossover_n": c["crossover_n"],
            "n_eff50": c["n_eff50"],
            "mesh_max_n": c["mesh_max_n"],
            "gflops_at_mesh_max": c["at_mesh_max"]["dist_gflops"],
            "speedup_at_mesh_max": c["at_mesh_max"]["speedup"],
            "comm_fraction_at_mesh_max": c["at_mesh_max"]["comm_fraction"],
        })
    # the headline row: the single-chip record scale on an 8-mesh
    # (N=65536 — the first nb·ndev multiple past the one-chip record
    # 40960; nt must be a multiple of ndev)
    art["record_on_mesh"] = project_packed_cyclic(
        65536, nb, 8, tier="f64x", itemsize=4, planes=2)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(art, f, indent=1)
    print(json.dumps({k: art[k] for k in ("memory_unlock", "crossovers")},
                     indent=1))
    print("wrote", OUT)


if __name__ == "__main__":
    main()
