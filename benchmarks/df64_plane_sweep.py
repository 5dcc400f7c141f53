"""df64-plane on-chip sweep: nt x slice_reuse (r5 isolation, round 2).

nt=2 measured df64-grade on chip while nt=4 degraded to 1.27e-07; the
structural difference past nt=2 is per-slab lax.dynamic_slice of the
SLICE SET at NONZERO traced offsets (probe D only covered offset 0).
This sweeps n in {384, 512, 768} (nt 3/4/6) for both trailing forms:
slice_reuse=True (slice once, dynamic-slice sub-ranges) and False
(re-slice per slab from the (hi, lo) planes).

Run:  setsid nohup python benchmarks/df64_plane_sweep.py \
        > benchmarks/results_r5/df64_plane_sweep.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def log(*a):
    print(*a, flush=True)


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np
    import scipy.linalg
    from jax.sharding import Mesh

    from dla_tpu.ops.df64 import to_df64
    from dla_tpu.parallel import (
        pack_cols_packed,
        potrf_packed_cyclic_df64,
        unpack_cols_packed,
    )

    log(f"backend={jax.default_backend()} devices={jax.devices()}")
    t0 = time.perf_counter()
    _ = float(jnp.linalg.norm(jnp.ones((256, 256), jnp.float32)))
    log(f"device warmup: {time.perf_counter() - t0:.1f}s")

    mesh1 = Mesh(np.asarray(jax.devices()[:1]), ("d",))
    nb = 128
    for n in (384, 512, 768):
        g = np.random.default_rng(5).standard_normal((n, n))
        a = (g + g.T) / 2 + n * np.eye(n)
        ah, al = to_df64(a)
        ref = scipy.linalg.cholesky(a, lower=True)
        for reuse in (True, False):
            try:
                xh = pack_cols_packed(np.asarray(ah), nb, mesh1)
                xl = pack_cols_packed(np.asarray(al), nb, mesh1)
                lh, ll = potrf_packed_cyclic_df64(
                    xh, xl, n, nb, mesh1, slice_reuse=reuse)
                l = (np.asarray(unpack_cols_packed(lh, n, nb, mesh1),
                                np.float64)
                     + np.asarray(unpack_cols_packed(ll, n, nb, mesh1),
                                  np.float64))
                ferr = np.max(np.abs(l - ref)) / np.max(np.abs(ref))
                log(f"[n={n} nt={n // nb} slice_reuse={reuse}] factor err "
                    f"{ferr:.3e} "
                    f"({'df64-grade' if ferr < 1e-11 else 'DEGRADED'})")
            except Exception:
                log(f"[n={n} slice_reuse={reuse}] CRASH")
                traceback.print_exc(file=sys.stdout)
    log("plane sweep complete")


if __name__ == "__main__":
    main()
