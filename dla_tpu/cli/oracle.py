"""LAPACK oracle program — the cross-implementation reference check.

Parity with the reference's standalone ground-truth programs
(``lapacke_dpotrf.c``: plain LAPACKE dpotrf + reconstruction residual at a
fixed N, same 1e-10 gate; and the hand-blocked ``lapack_dpotrf_remix_c.c``,
whose algorithmic skeleton lives on as ``dla_tpu.ops.potrf_unblocked`` /
``algos.potrf_blocked`` — SURVEY §4.2 "test oracle pattern").

Runs scipy's LAPACK ``dpotrf`` on the library's own seeded generator and —
optionally — cross-checks the library factorization against it elementwise,
printing the same contract lines as the main driver.

Usage:
    python -m dla_tpu.cli.oracle --n 4096 --nb 256 [--cross-check]
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="dla-oracle")
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--nb", type=int, default=256, help="library NB for --cross-check")
    ap.add_argument("--seed", type=int, default=51)
    ap.add_argument("--cross-check", action="store_true")
    args = ap.parse_args(argv)

    import numpy as np
    import scipy.linalg

    from dla_tpu.runtime.staging import HostTileStore

    n = args.n
    with HostTileStore(n, np.float64) as st:
        st.fill_plgsy(seed=args.seed)
        a = np.tril(st.array) + np.tril(st.array, -1).T

    t0 = time.perf_counter()
    c, info = scipy.linalg.lapack.dpotrf(a, lower=1)
    t1 = time.perf_counter()
    if info != 0:
        print(f"dpotrf info={info} — FAIL")
        return 1
    l = np.tril(c)
    print(f"Elapsed: {(t1 - t0) * 1e3:.1f} ms")
    print(f"Performance: {(n**3 / 3) / (t1 - t0) / 1e9:.2f} Gflop/s")
    r = a - l @ l.T
    res = np.abs(r).sum(axis=1).max() / np.abs(a).sum(axis=1).max()
    print(f"||A - LL^T||_inf / ||A||_inf = {res:.2e}")
    ok = res < 1e-10
    print("PASS" if ok else "FAIL", "(gate 1e-10)")

    if args.cross_check:
        import jax

        jax.config.update("jax_enable_x64", True)
        import jax.numpy as jnp

        from dla_tpu.algos import potrf_blocked

        lj = np.asarray(potrf_blocked(jnp.asarray(a), nb=args.nb))
        diff = np.abs(lj - l).max() / np.abs(l).max()
        print(f"max elementwise |L_dla - L_lapack| / max|L| = {diff:.2e}")
        ok = ok and diff < 1e-12
        print("CROSS-CHECK", "PASS" if diff < 1e-12 else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
