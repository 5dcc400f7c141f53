"""Out-of-core POTRF: host-DRAM-resident matrix, device-factored panels.

The capability target is BASELINE.json config 5 (N=262144 with host-DRAM
tile staging) — the scale regime the reference served with its distributed
blob store (the ArmoniK client holds the full matrix, workers hold O(B²) —
SURVEY §5.7). The TPU-native design:

- the matrix lives in a :class:`~dla_tpu.runtime.staging.HostTileStore`
  (page-aligned RAM or disk-backed memmap; the native C++ runtime does the
  strided panel gather/scatter);
- a **left-looking** panel algorithm streams one column panel at a time to
  the device: panel j is updated against every previously-factored panel k
  (one device GEMM per k), then factored on-device (blocked right-looking
  within the panel), then scattered back. Device working set = 2 panels,
  independent of N;
- factored panels are final the moment they are written back, so the
  store *is* the checkpoint: with a disk-backed store and a progress
  sidecar, an interrupted factorization resumes at the first unfinished
  panel (the reference's only resume story was append-mode CSVs —
  SURVEY §5.3/5.4; here the compute itself resumes);
- validation at this scale is a Freivalds residual probe (O(N²) per probe,
  native) instead of a dense O(N³) reconstruction.
"""

from __future__ import annotations

import functools
import json
import os
from typing import Callable

import numpy as np

from dla_tpu.runtime.staging import HostTileStore


@functools.lru_cache(maxsize=None)
def _jitted(kind: str, shape: tuple, nb: int, dtype_str: str):
    """Per-shape jitted device steps (cached)."""
    import jax
    import jax.numpy as jnp

    from dla_tpu.ops import gemm, trsm

    del dtype_str  # shapes+dtype come in via the arguments

    if kind == "update":
        # panel -= Lk @ Lk[:pw].T   (left-looking accumulation)
        def f(panel, lk):
            pw = panel.shape[1]
            return gemm(-1.0, lk, lk[:pw], 1.0, panel, transb=True)

        return jax.jit(f, donate_argnums=(0,))

    if kind == "factor":
        # blocked right-looking factor of a tall panel (m, w), m >= w
        def f(panel):
            m, w = panel.shape
            for off in range(0, w, nb):
                bw = min(nb, w - off)
                d = panel[off : off + bw, off : off + bw]
                lkk = jnp.tril(jax.lax.linalg.cholesky(d, symmetrize_input=False))
                panel = panel.at[off : off + bw, off : off + bw].set(lkk)
                if off + bw >= m:
                    break
                below = trsm(
                    1.0, lkk, panel[off + bw :, off : off + bw],
                    side="R", uplo="L", transa=True,
                )
                panel = panel.at[off + bw :, off : off + bw].set(below)
                if off + bw < w:
                    rest = panel[off + bw :, off + bw : w]
                    upd = gemm(
                        -1.0, below, below[: w - off - bw], 1.0, rest, transb=True
                    )
                    panel = panel.at[off + bw :, off + bw : w].set(upd)
            return panel

        return jax.jit(f, donate_argnums=(0,))

    raise ValueError(kind)


def potrf_outofcore(
    store: HostTileStore,
    *,
    panel: int = 4096,
    nb: int = 512,
    progress_path: str | None = None,
    on_panel: Callable[[int, int], None] | None = None,
) -> None:
    """Factor the SPD matrix in ``store`` in place (lower triangle becomes L).

    Args:
      store: host-resident matrix (only the lower triangle is read/written).
      panel: column-panel width streamed to the device (device working set
        is ~2 · N · panel elements).
      nb: blocking inside the on-device panel factorization.
      progress_path: optional JSON sidecar for checkpoint/resume — panels
        recorded there are skipped (use with a disk-backed store).
      on_panel: optional callback(panel_index, n_panels) after each panel.
    """
    import jax
    import jax.numpy as jnp

    if store.dtype == np.float64 and not jax.config.jax_enable_x64:
        raise ValueError(
            "store is float64 but jax_enable_x64 is off — panels would be "
            "silently downcast to float32 on device; enable x64 first"
        )

    n = store.n
    if n % panel:
        raise ValueError(f"n={n} must be a multiple of panel={panel}")
    npan = n // panel
    done: set[int] = set()
    if progress_path and os.path.exists(progress_path):
        with open(progress_path) as f:
            state = json.load(f)
        if state.get("n") == n and state.get("panel") == panel:
            done = set(state.get("done", []))

    dtype_str = str(store.dtype)
    for j in range(npan):
        if j in done:
            continue
        j0 = j * panel
        ph = n - j0
        pj = jnp.asarray(store.pack(j0, j0, ph, panel))
        for k in range(j):
            k0 = k * panel
            lk = jnp.asarray(store.pack(j0, k0, ph, panel))
            pj = _jitted("update", (ph, panel), nb, dtype_str)(pj, lk)
        pj = _jitted("factor", (ph, panel), nb, dtype_str)(pj)
        store.unpack(j0, j0, np.asarray(pj))
        done.add(j)
        if progress_path:
            tmp = progress_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump({"n": n, "panel": panel, "done": sorted(done)}, f)
            os.replace(tmp, progress_path)
        if on_panel:
            on_panel(j, npan)
