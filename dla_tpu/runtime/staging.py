"""ctypes bindings to the native host runtime (libdlats.so) and the
HostTileStore used by the out-of-core factorization.

Builds the shared library on first use (g++, cached next to the source).
All heavy host-memory operations (seeded generation, strided panel
gather/scatter, norms, Freivalds residual probes) run in C++ at memory
bandwidth — the Python layer only orchestrates (SURVEY §1 L1/L4 TPU
mapping: the native runtime survives, the scheduler does not).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "csrc")
_LIB_PATH = os.path.join(_CSRC, "libdlats.so")
_lock = threading.Lock()
_lib = None


def _build() -> None:
    subprocess.run(
        ["make", "-C", _CSRC],
        check=True,
        capture_output=True,
        text=True,
    )


def lib() -> ctypes.CDLL:
    """Load (building if needed) the native runtime library."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        src = os.path.join(_CSRC, "tilestore.cpp")
        if not os.path.exists(_LIB_PATH) or os.path.getmtime(
            _LIB_PATH
        ) < os.path.getmtime(src):
            _build()
        l = ctypes.CDLL(_LIB_PATH)
        i64, u32, f64 = ctypes.c_int64, ctypes.c_uint32, ctypes.c_double
        vp = ctypes.c_void_p
        l.dla_alloc.restype = vp
        l.dla_alloc.argtypes = [i64]
        l.dla_free.argtypes = [vp]
        for suf in ("f32", "f64"):
            fn = getattr(l, f"dla_plgsy_{suf}")
            fn.argtypes = [vp, i64, u32, i64, i64, i64, i64, f64]
            fn = getattr(l, f"dla_copy2d_{suf}")
            fn.argtypes = [vp, i64, vp, i64, i64, i64]
            fn = getattr(l, f"dla_norm_inf_sym_lower_{suf}")
            fn.restype = f64
            fn.argtypes = [vp, i64, i64]
            fn = getattr(l, f"dla_freivalds_{suf}")
            fn.restype = f64
            fn.argtypes = [vp, vp, i64, i64, u32]
        _lib = l
        return _lib


_DTYPES = {np.float32: "f32", np.float64: "f64"}


def _suf(dtype) -> str:
    key = np.dtype(dtype).type
    if key not in _DTYPES:
        raise ValueError(f"unsupported dtype {dtype}")
    return _DTYPES[key]


class HostTileStore:
    """A page-aligned host-resident n×n matrix with native tile ops.

    The out-of-core working set: the matrix lives here (host DRAM, up to
    ~100 GB on this box); panels are gathered into contiguous staging
    buffers and shipped to the device, factored panels scattered back.
    """

    def __init__(self, n: int, dtype=np.float32, *, path: str | None = None):
        """``path=None``: page-aligned RAM allocation. ``path=...``: a
        disk-backed ``np.memmap`` — the checkpointable variant (the matrix
        itself persists across process restarts; see
        ``algos.oocore.potrf_outofcore`` resume support)."""
        self.n = int(n)
        self.dtype = np.dtype(dtype)
        self._suf = _suf(dtype)
        self._lib = lib()
        self.path = path
        if path is not None:
            self._ptr = None
            self.array = np.memmap(path, dtype=self.dtype, mode="r+" if os.path.exists(path) else "w+", shape=(self.n, self.n))
        else:
            nbytes = self.n * self.n * self.dtype.itemsize
            self._ptr = self._lib.dla_alloc(nbytes)
            if not self._ptr:
                raise MemoryError(f"failed to allocate {nbytes} bytes")
            ctype = ctypes.c_float if self._suf == "f32" else ctypes.c_double
            buf = (ctype * (self.n * self.n)).from_address(self._ptr)
            self.array = np.frombuffer(buf, dtype=self.dtype).reshape(self.n, self.n)

    def close(self):
        if getattr(self, "_ptr", None):
            self.array = None
            self._lib.dla_free(self._ptr)
            self._ptr = None
        elif getattr(self, "array", None) is not None and self.path is not None:
            self.array.flush()
            self.array = None

    def __del__(self):  # pragma: no cover - finalizer
        try:
            self.close()
        except Exception:
            pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def _addr(self, i0: int = 0, j0: int = 0) -> int:
        return self.array.ctypes.data + (i0 * self.n + j0) * self.dtype.itemsize

    # -- native ops ----------------------------------------------------------

    def fill_plgsy(self, *, seed: int = 51, bump: float | None = None):
        """Generate the seeded symmetric matrix in place (bit-identical to
        the JAX ``plgsy`` generator)."""
        if bump is None:
            bump = float(self.n)
        getattr(self._lib, f"dla_plgsy_{self._suf}")(
            self._addr(), self.n, seed & 0xFFFFFFFF, 0, 0, self.n, self.n, bump
        )

    def pack(self, i0: int, j0: int, h: int, w: int, out: np.ndarray | None = None):
        """Gather the (h, w) submatrix at (i0, j0) into a contiguous buffer."""
        if out is None:
            out = np.empty((h, w), self.dtype)
        assert out.flags.c_contiguous and out.shape == (h, w)
        getattr(self._lib, f"dla_copy2d_{self._suf}")(
            self._addr(i0, j0), self.n, out.ctypes.data, w, h, w
        )
        return out

    def unpack(self, i0: int, j0: int, src: np.ndarray):
        """Scatter a contiguous (h, w) buffer back at (i0, j0)."""
        src = np.ascontiguousarray(src, self.dtype)
        h, w = src.shape
        getattr(self._lib, f"dla_copy2d_{self._suf}")(
            src.ctypes.data, w, self._addr(i0, j0), self.n, h, w
        )

    def norm_inf_sym_lower(self) -> float:
        return getattr(self._lib, f"dla_norm_inf_sym_lower_{self._suf}")(
            self._addr(), self.n, self.n
        )

    def freivalds_residual(self, factor: "HostTileStore", *, probes: int = 4) -> float:
        """Probabilistic relative residual of A ≈ L·L^T: max over random
        probe vectors x of ||(A − L·L^T)x||_inf / (||A||_inf ||x||_inf),
        O(N²) per probe. ``self`` holds A (lower), ``factor`` holds L."""
        assert factor.n == self.n and factor.dtype == self.dtype
        na = self.norm_inf_sym_lower()
        worst = 0.0
        for p in range(probes):
            # native probe returns ||(A − LL^T)x||_inf already normalized by
            # the probe's actual ||x||_inf (NaN on allocation failure)
            err = getattr(self._lib, f"dla_freivalds_{self._suf}")(
                self._addr(), factor._addr(), self.n, self.n, 0xC0FFEE ^ p
            )
            worst = max(worst, err / na)
        return worst
