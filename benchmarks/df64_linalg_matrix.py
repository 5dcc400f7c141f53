"""On-chip accuracy matrix of the XLA linalg ops the df64 refinement
leans on (r5 isolation follow-up: the distributed-df64 probe and the
packed serve degraded on chip while single-chip potrf_df64 measured
5e-13 — same helpers, different shapes/flavors; and the trace-time
default_matmul_precision pin changed NOTHING because cholesky_p /
triangular_solve_p decompose into dots at LOWERING time).

Measures relative error vs scipy fp64 for:
  - lax.linalg.cholesky at nb in {128, 512, 1024}
  - lax.linalg.triangular_solve, all four (left, transpose) flavors,
    at nb in {128, 1024}
Run it twice: JAX_DEFAULT_MATMUL_PRECISION unset vs =float32 (the env
var sets the config at process start, which DOES cover lowering) to
decide whether the global default is the lever.

Run:  setsid nohup python benchmarks/df64_linalg_matrix.py \
        > benchmarks/results_r5/df64_linalg_matrix.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

OUTDIR = os.path.join(REPO, "benchmarks", "results_r5")
OUT = os.path.join(OUTDIR, "df64_linalg_matrix.jsonl")


def log(*a):
    print(*a, flush=True)


def emit(row):
    os.makedirs(OUTDIR, exist_ok=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    log("ROW", json.dumps(row))


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np
    from jax import lax
    import scipy.linalg

    prec_env = os.environ.get("JAX_DEFAULT_MATMUL_PRECISION", "<unset>")
    log(f"backend={jax.default_backend()} devices={jax.devices()} "
        f"JAX_DEFAULT_MATMUL_PRECISION={prec_env}")
    t0 = time.perf_counter()
    _ = float(jnp.linalg.norm(jnp.ones((256, 256), jnp.float32)))
    log(f"device warmup: {time.perf_counter() - t0:.1f}s")

    rng = np.random.default_rng(3)

    for nb in (128, 512, 1024):
        g = rng.standard_normal((nb, nb))
        a = ((g + g.T) / 2 + nb * np.eye(nb)).astype(np.float64)
        ref = scipy.linalg.cholesky(a, lower=True)
        l32 = np.asarray(jax.jit(
            lambda x: lax.linalg.cholesky(x, symmetrize_input=False))(
                jnp.asarray(a, jnp.float32)), np.float64)
        err = np.max(np.abs(np.tril(l32) - ref)) / np.max(np.abs(ref))
        emit({"op": "cholesky", "nb": nb, "prec_env": prec_env,
              "rel_err": float(err)})

    for nb in (128, 1024):
        g = rng.standard_normal((nb, nb))
        lt = np.tril(g) + nb * np.eye(nb)
        b = rng.standard_normal((3 * nb, nb))
        for left in (False, True):
            for trans in (False, True):
                bb = b.T if left else b
                op = lt.T if trans else lt
                # left: op(L)·x = bb ; right: x·op(L) = bb
                ref = (np.linalg.solve(op, bb) if left
                       else np.linalg.solve(op.T, bb.T).T)
                x32 = np.asarray(jax.jit(
                    lambda aa, rr, _l=left, _t=trans:
                    lax.linalg.triangular_solve(
                        aa, rr, left_side=_l, lower=True,
                        transpose_a=_t))(
                        jnp.asarray(lt, jnp.float32),
                        jnp.asarray(bb, jnp.float32)), np.float64)
                err = np.max(np.abs(x32 - ref)) / np.max(np.abs(ref))
                emit({"op": "triangular_solve", "nb": nb,
                      "left": left, "trans": trans, "prec_env": prec_env,
                      "rel_err": float(err)})

    log("linalg matrix complete")


if __name__ == "__main__":
    main()
