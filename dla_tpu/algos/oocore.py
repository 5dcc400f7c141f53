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
- the k-panel stream is **double-buffered**: a host prefetch thread packs
  panel k+1 and starts its host→device transfer while the device runs the
  update GEMM against panel k (the TPU-native analogue of the reference's
  pinned-buffer DMA overlap, ``v6_script_cholesky_w_residu_malloc.c:41-58``);
- factored panels are committed **transactionally** when a progress sidecar
  is used: the factored panel is first written to a scratch file (atomic
  rename), the sidecar records the in-flight commit, and only then is the
  store overwritten — a crash anywhere leaves either the pristine panel or
  a durable copy of the factored one, never a torn write (an interrupted
  run resumes at the first unfinished panel; the reference's only resume
  story was append-mode CSVs — SURVEY §5.3/5.4);
- validation at this scale is a Freivalds residual probe (O(N²) per probe,
  native) instead of a dense O(N³) reconstruction.
"""

from __future__ import annotations

import functools
import json
import os
import time
from concurrent.futures import ThreadPoolExecutor
from typing import Callable

import numpy as np

from dla_tpu.runtime.staging import HostTileStore


def _fsync_dir(path: str) -> None:
    """fsync a directory so a completed rename survives power loss."""
    try:
        fd = os.open(path, os.O_RDONLY | getattr(os, "O_DIRECTORY", 0))
    except OSError:  # pragma: no cover - exotic fs
        return
    try:
        os.fsync(fd)
    finally:
        os.close(fd)


# Row-chunk size for single-device host GEMMs: one monolithic multi-GiB
# GEMM runs at ~24 GF/s under 4K pages (TLB-bound; measured on this VM with
# THP disabled — see CLAUDE.md) while ~128 MiB row chunks stream at
# ~72 GF/s. Same flops, same result.
_ROW_CHUNK = 8192


@functools.lru_cache(maxsize=None)
def _jitted(kind: str, shape: tuple, nb: int, dtype_str: str,
            sharded: bool = False):
    """Per-shape jitted device steps (cached)."""
    import jax
    import jax.numpy as jnp

    from dla_tpu.ops import gemm, trsm

    del dtype_str  # shapes+dtype come in via the arguments

    def by_rows(fn, *arrays):
        """Apply a row-wise map in _ROW_CHUNK slabs (monolithic when
        sharded — chunk+concat would fight the SPMD partitioner)."""
        m = arrays[0].shape[0]
        if sharded or m <= _ROW_CHUNK:
            return fn(*arrays)
        return jnp.concatenate(
            [fn(*(a[i : i + _ROW_CHUNK] for a in arrays))
             for i in range(0, m, _ROW_CHUNK)],
            axis=0,
        )

    if kind == "update":
        # panel -= Lk @ Lk[:pw].T   (left-looking accumulation)
        def f(panel, lk):
            top = lk[: panel.shape[1]]
            return by_rows(
                lambda l, p: gemm(-1.0, l, top, 1.0, p, transb=True),
                lk, panel,
            )

        # With row-sharded operands XLA's SPMD partitioner turns lk[:pw]
        # into an all-gather of the top rows and keeps the GEMM local —
        # the panel stream scales over the mesh with no code change.
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
                bbelow = panel[off + bw :, off : off + bw]
                if panel.dtype == jnp.float64:
                    # fp64 carries the 1e-10 contract: use true substitution
                    # (no inv(L_kk) error amplification ~kappa(L_kk)*eps on
                    # ill-conditioned input — ADVICE r2). Slower on XLA CPU,
                    # but fp64 runs are the small gate configs.
                    below = trsm(1.0, lkk, bbelow, side="R", uplo="L",
                                 transa=True)
                else:
                    # TRSM-as-GEMM: a direct triangular_solve against the
                    # ~10⁵-row panel lowers to naive substitution on XLA CPU
                    # (~1 GF/s — measured 500 s/panel at N=131072); an
                    # nb-sized triangular inverse + one GEMM runs at sgemm
                    # speed. Same transformation the TPU panel solves use
                    # (ops/lapack_like.trtri_lower). Conditioning caveat: the
                    # explicit inverse amplifies error by ~kappa(L_kk); fine
                    # for the fp32 residual class, excluded from fp64 above.
                    inv = trsm(  # inv(L_kk): L_kk X = I
                        1.0, lkk, jnp.eye(bw, dtype=panel.dtype),
                        side="L", uplo="L", transa=False,
                    )
                    below = by_rows(
                        lambda b: gemm(1.0, b, inv, 0.0, jnp.zeros_like(b),
                                       transb=True),
                        bbelow,
                    )
                panel = panel.at[off + bw :, off : off + bw].set(below)
                if off + bw < w:
                    rest = panel[off + bw :, off + bw : w]
                    btop = below[: w - off - bw]
                    upd = by_rows(
                        lambda b, r: gemm(-1.0, b, btop, 1.0, r, transb=True),
                        below, rest,
                    )
                    panel = panel.at[off + bw :, off + bw : w].set(upd)
            return panel

        return jax.jit(f, donate_argnums=(0,))

    raise ValueError(kind)


class _Sidecar:
    """Atomic progress sidecar with transactional panel commits.

    States per panel: absent (untouched in store) → committing (factored
    data durable in the scratch file, store possibly torn) → done (store
    holds the factored panel). All sidecar/scratch writes are
    write-tmp-then-rename, so every crash point recovers cleanly.
    """

    def __init__(self, path: str, n: int, panel: int, store=None):
        self.path = path
        self.scratch = path + ".commit.npy"
        self.n, self.panel = n, panel
        # A DirectPanelStore brings its own O_DIRECT scratch region (a .npy
        # staging copy would crawl through this VM's pathological page cache)
        self._store = store if hasattr(store, "write_scratch") else None
        self.done: set[int] = set()
        self.committing: int | None = None
        if os.path.exists(path):
            with open(path) as f:
                state = json.load(f)
            if state.get("n") == n and state.get("panel") == panel:
                self.done = set(state.get("done", []))
                self.committing = state.get("committing")

    def _write(self):
        tmp = self.path + ".tmp"
        state = {"n": self.n, "panel": self.panel, "done": sorted(self.done)}
        if self.committing is not None:
            state["committing"] = self.committing
        with open(tmp, "w") as f:
            json.dump(state, f)
            f.flush()
            os.fsync(f.fileno())  # sidecar durable before the rename lands
        os.replace(tmp, self.path)
        _fsync_dir(os.path.dirname(self.path) or ".")

    def stage(self, j: int, data: np.ndarray):
        """Durably record panel j's factored data before the store is touched.

        Power-loss ordering: the scratch bytes are fsync'd (O_DIRECT writes
        are durable at completion; the .npy fallback fsyncs explicitly)
        BEFORE the sidecar's 'committing' record, so recovery never replays
        a torn scratch region (ADVICE r2)."""
        if self._store is not None:
            self._store.write_scratch(data)
        else:
            tmp = self.scratch + ".tmp"
            with open(tmp, "wb") as f:
                np.save(f, data)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, self.scratch)
            _fsync_dir(os.path.dirname(self.scratch) or ".")
        self.committing = j
        self._write()

    def commit(self, j: int):
        self.done.add(j)
        self.committing = None
        self._write()
        if self._store is None and os.path.exists(self.scratch):
            os.remove(self.scratch)

    def recover(self, store: HostTileStore):
        """Replay an interrupted commit: the scratch file is the source of
        truth for the in-flight panel (the store may hold a torn write)."""
        j = self.committing
        if j is None:
            return
        if self._store is not None:
            # the sidecar's `committing` is only written after the scratch
            # region write completed, so the scratch is whole
            self._store.commit_scratch(j)
            self.commit(j)
        elif os.path.exists(self.scratch):
            data = np.load(self.scratch)
            store.unpack(j * self.panel, j * self.panel, data)
            self.commit(j)
        else:
            # crashed between sidecar write and scratch rename is impossible
            # (scratch is written first); a missing scratch means the stage()
            # itself never completed — the store panel is still pristine.
            self.committing = None
            self._write()


def _potrf_outofcore_host(
    store: HostTileStore,
    *,
    panel: int,
    nb: int,
    progress_path: str | None,
    on_panel: Callable[[int, int], None] | None,
    prefetch: bool,
) -> dict:
    """Host-BLAS out-of-core POTRF: the same left-looking panel algorithm as
    the device path, executed fully **in place** with direct OpenBLAS calls
    (`runtime.hostblas`) — zero temporaries, zero recompiles, no defensive
    copies. This is the shipping path for the single-host CPU-bound at-scale
    configs (the TPU tunnel's ~46 MB/s h2d rules the device out at N≥10⁵ —
    docs/ROADMAP.md): measured ~120 GF/s sustained on this VM's single core
    vs ~15-40 GF/s for the XLA CPU path it replaces (the r2 'unexplained
    2-4× gap', closed by removing XLA's per-call allocation + copy costs).
    The reference's host side made exactly these direct BLAS calls under
    Chameleon (SURVEY §1 L0)."""
    from dla_tpu.runtime import hostblas as hb

    n = store.n
    if n % panel:
        raise ValueError(f"n={n} must be a multiple of panel={panel}")
    npan = n // panel
    side = _Sidecar(progress_path, n, panel, store=store) if progress_path else None
    if side:
        side.recover(store)
    releases = getattr(store, "release", None)

    stats = {
        "pack_s": 0.0, "h2d_wait_s": 0.0, "writeback_s": 0.0,
        "bytes_in": 0, "bytes_out": 0, "wall_s": 0.0, "panels": 0,
    }
    wall0 = time.perf_counter()
    item = store.dtype.itemsize
    pool = ThreadPoolExecutor(max_workers=1) if prefetch else None

    def fetch(j0: int, k0: int, ph: int) -> np.ndarray:
        t0 = time.perf_counter()
        buf = store.pack(j0, k0, ph, panel)
        stats["pack_s"] += time.perf_counter() - t0
        stats["bytes_in"] += ph * panel * item
        return buf

    try:
        for j in range(npan):
            if side and j in side.done:
                continue
            j0 = j * panel
            ph = n - j0
            pj = fetch(j0, j0, ph)
            nxt = pool.submit(fetch, j0, 0, ph) if pool and j > 0 else None
            for k in range(j):
                t0 = time.perf_counter()
                lk = nxt.result() if nxt is not None else fetch(j0, k * panel, ph)
                stats["h2d_wait_s"] += time.perf_counter() - t0
                if pool and k + 1 < j:
                    nxt = pool.submit(fetch, j0, (k + 1) * panel, ph)
                else:
                    nxt = None
                # pj -= Lk · Lk[:w]ᵀ, in place (BLAS releases the GIL, so
                # the prefetch memcpy/read overlaps even on one core)
                hb.gemm(-1.0, lk, lk[:panel], 1.0, pj, transb=True)
                if releases is not None:
                    releases(lk)
            hb.factor_panel(pj, nb)
            t0 = time.perf_counter()
            if side:
                side.stage(j, pj)
            store.unpack(j0, j0, pj)
            if side:
                side.commit(j)
            stats["writeback_s"] += time.perf_counter() - t0
            stats["bytes_out"] += pj.nbytes
            stats["panels"] += 1
            if releases is not None:
                releases(pj)
            if on_panel:
                on_panel(j, npan)
    finally:
        if pool:
            pool.shutdown(wait=False, cancel_futures=True)
    stats["wall_s"] = time.perf_counter() - wall0
    return stats


def potrf_outofcore(
    store: HostTileStore,
    *,
    panel: int = 4096,
    nb: int = 512,
    progress_path: str | None = None,
    on_panel: Callable[[int, int], None] | None = None,
    prefetch: bool = True,
    mesh=None,
    height_bucket: int | None = None,
    host_blas: bool = False,
) -> dict:
    """Factor the SPD matrix in ``store`` in place (lower triangle becomes L).

    Args:
      store: host-resident matrix (only the lower triangle is read/written).
      panel: column-panel width streamed to the device (device working set
        is ~2 · N · panel elements).
      nb: blocking inside the on-device panel factorization.
      progress_path: optional JSON sidecar for checkpoint/resume — panels
        recorded there are skipped, and panel writebacks become
        transactional (scratch-file staged) so a crash mid-writeback
        cannot corrupt the store (use with a disk-backed store).
      on_panel: optional callback(panel_index, n_panels) after each panel.
      prefetch: overlap host pack + h2d of panel k+1 with the device update
        GEMM against panel k (double buffering).
      height_bucket: round every streamed panel height up to a multiple of
        this (zero-padded rows below the matrix; requires a store whose
        ``pack`` supports overhang, i.e. ``DirectPanelStore``). Collapses
        the per-panel jit shapes (~2·npan distinct programs) to
        ~2·n/height_bucket — XLA CPU recompiles per shape, and per-panel
        compiles were a first-order cost at N=131072. Padded rows are
        mathematically inert (zero GEMM contributions, untouched by the
        diagonal factor) and are sliced off before writeback. Single-device
        only (a pad+concat program would fight the SPMD partitioner).
      host_blas: execute the panel algorithm fully in place with direct
        OpenBLAS calls on the host (no device, no XLA) — the fast path for
        single-host CPU-bound at-scale runs (~120 GF/s vs ~15-40 GF/s via
        XLA CPU on this VM). Mutually exclusive with ``mesh``/
        ``height_bucket`` (no jit shapes to bucket).
      mesh: optional ``jax.sharding.Mesh`` — the **distributed out-of-core**
        configuration (BASELINE.json config 5 at multi-chip scale: N bounded
        by host DRAM/disk, not by per-chip or even aggregate HBM). Streamed
        panels are row-sharded over all mesh axes; the update GEMMs run
        SPMD with XLA-inserted collectives (the top-``w`` rows of the k
        panel are all-gathered, everything else stays local). Requires
        ``panel`` to be a multiple of ``mesh.size``.

    Returns:
      staging stats: bytes/seconds for pack (host gather), h2d wait, d2h +
      scatter, and total wall — the measured staging bandwidth.
    """
    if host_blas:
        if mesh is not None or height_bucket is not None:
            raise ValueError(
                "host_blas is the single-host in-place path — no mesh, and "
                "height_bucket is a jit-shape optimization it doesn't need"
            )
        return _potrf_outofcore_host(
            store, panel=panel, nb=nb, progress_path=progress_path,
            on_panel=on_panel, prefetch=prefetch,
        )

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
    sharding = None
    if mesh is not None:
        if panel % mesh.size:
            raise ValueError(
                f"panel={panel} must be a multiple of mesh.size={mesh.size}"
            )
        sharding = jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec(mesh.axis_names, None)
        )
    if height_bucket is not None and mesh is not None:
        raise ValueError("height_bucket is a single-device optimization")
    if height_bucket is not None and not hasattr(store, "commit_scratch"):
        raise ValueError(
            "height_bucket requires a panel store whose pack() supports "
            "zero-padded overhang (DirectPanelStore)"
        )
    side = _Sidecar(progress_path, n, panel, store=store) if progress_path else None
    if side:
        side.recover(store)
    # Pooled stores (DirectPanelStore) take their staging buffers back at the
    # END of each panel iteration: jax zero-copy-aliases aligned host buffers
    # on the CPU backend, so a buffer is only reusable once every computation
    # reading it has executed — the iteration-end d2h readback of the factored
    # panel is exactly that sync point (the final panel value depends on every
    # update GEMM, which each read one staged buffer).
    releases = getattr(store, "release", None)
    pending: list = []

    stats = {
        "pack_s": 0.0, "h2d_wait_s": 0.0, "writeback_s": 0.0,
        "bytes_in": 0, "bytes_out": 0, "wall_s": 0.0, "panels": 0,
    }
    wall0 = time.perf_counter()
    item = store.dtype.itemsize
    wb_buf = None  # persistent writeback buffer (sharded-mesh path)
    pool = ThreadPoolExecutor(max_workers=1) if prefetch else None

    def fetch(j0: int, k0: int, ph: int):
        """pack + start h2d for the (ph, panel) block at (j0, k0)."""
        t0 = time.perf_counter()
        buf = store.pack(j0, k0, ph, panel)
        t1 = time.perf_counter()
        if sharding is not None:
            arr = jax.device_put(buf, sharding)  # row-sharded over the mesh
        else:
            arr = jnp.asarray(buf)  # async h2d dispatch (may alias buf!)
        if releases is not None:
            pending.append(buf)
        stats["pack_s"] += t1 - t0
        stats["bytes_in"] += ph * panel * item
        return arr

    dtype_str = str(store.dtype)
    try:
        for j in range(npan):
            if side and j in side.done:
                continue
            j0 = j * panel
            ph = n - j0
            if height_bucket is not None:
                ph = min(n, -(-ph // height_bucket) * height_bucket)
            pj = fetch(j0, j0, ph)
            nxt = None
            if pool and j > 0:
                nxt = pool.submit(fetch, j0, 0, ph)
            for k in range(j):
                t0 = time.perf_counter()
                lk = nxt.result() if nxt is not None else fetch(j0, k * panel, ph)
                stats["h2d_wait_s"] += time.perf_counter() - t0
                if pool and k + 1 < j:
                    nxt = pool.submit(fetch, j0, (k + 1) * panel, ph)
                else:
                    nxt = None
                pj = _jitted("update", (ph, panel), nb, dtype_str,
                             sharding is not None)(pj, lk)
            pj = _jitted("factor", (ph, panel), nb, dtype_str,
                         sharding is not None)(pj)
            t0 = time.perf_counter()
            pj.block_until_ready()  # attribute the compute tail to sync_s,
            # not writeback_s (np.asarray would otherwise absorb it)
            stats["sync_s"] = stats.get("sync_s", 0.0) + (
                time.perf_counter() - t0)
            t0 = time.perf_counter()
            if sharding is not None:
                # np.asarray of a SHARDED array concatenates the shards into
                # a FRESH numpy allocation every panel — under this VM's
                # balloon-throttled page supply that runs at ~5 MB/s and
                # made writeback 55% of the r4 combo run (CLAUDE.md).
                # Instead copy shard views (zero-copy host memory on the
                # CPU backend) into ONE persistent pre-faulted buffer.
                if wb_buf is None or wb_buf.size < n * panel:
                    from dla_tpu.runtime.staging import _aligned_empty

                    wb_buf = _aligned_empty(n * panel * item).view(
                        store.dtype)[: n * panel].reshape(n, panel)
                host_pj = wb_buf[:ph]
                r0 = 0
                for sh in sorted(
                    pj.addressable_shards,
                    key=lambda s: s.index[0].start or 0,
                ):
                    d = np.asarray(sh.data)
                    np.copyto(host_pj[r0: r0 + d.shape[0]], d)
                    r0 += d.shape[0]
                assert r0 == ph, (r0, ph)
            else:
                host_pj = np.asarray(pj)  # d2h (blocks until panel done)
            host_pj = host_pj[: n - j0]  # drop bucketed pad rows
            if side:
                side.stage(j, host_pj)
            store.unpack(j0, j0, host_pj)
            if side:
                side.commit(j)
            stats["writeback_s"] += time.perf_counter() - t0
            stats["bytes_out"] += host_pj.nbytes
            stats["panels"] += 1
            if releases is not None:
                # the d2h readback above proves every update consumed its
                # staged buffer — safe to recycle them all now
                del pj, host_pj
                for buf in pending:
                    releases(buf)
                pending.clear()
            if on_panel:
                on_panel(j, npan)
    finally:
        if pool:
            pool.shutdown(wait=False, cancel_futures=True)
    stats["wall_s"] = time.perf_counter() - wall0
    return stats
