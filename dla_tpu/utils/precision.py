"""Matmul precision policy.

On TPU, fp32 ``dot`` defaults to a single bf16 MXU pass (~2e-3 relative
error) — unacceptable for a linear-algebra library claiming fp32 results.
The library default is ``"high"`` (3-pass bf16x3 — the TPU's
"fp32-effective" mode, and the tier the reference's fp32-effective-peak
accounting corresponds to): measured END-TO-END on v5e at N=32768 it
matches true-fp32 accumulation in accuracy while running 1.56× faster
(POTRF residual 2.68e-06 at ``high`` / 35.4 TF/s vs 1.93e-06 at
``highest`` / 22.7 TF/s — ``BENCH_r02``, ``results_r2/sweep.csv``).
Overridable globally via the ``DLA_TPU_MATMUL_PRECISION`` env var:

- ``default``  — 1 bf16 pass, ~full MXU peak (182 TF/s measured ceiling),
  residual ~N·2e-3-grade
- ``high``     — 3-pass bf16x3, ~1/3 peak (63 TF/s ceiling), measured
  fp32-grade residual end-to-end — **the library default**
- ``highest``/``float32`` — true fp32 accumulation, ~1/6 peak (31.4 TF/s
  ceiling) — the conservative tier for precision studies

fp64 paths are unaffected (CPU/x64 computes in real fp64), and the
validators pin ``precision="highest"`` internally regardless of the policy
(a validator must never be less accurate than what it validates —
ROADMAP r1 negative results, "validator self-pollution").

Algorithms additionally accept an explicit ``precision=...`` static argument
(threaded via :func:`override`) so a single process can trace the same
program at several precisions — the env var alone cannot retrigger a jit
trace.
"""

from __future__ import annotations

import contextlib
import os

_VALID = ("default", "high", "highest", "float32", "fastest")

DEFAULT = "high"

_override: str | None = None


def matmul_precision() -> str:
    if _override is not None:
        return _override
    p = os.environ.get("DLA_TPU_MATMUL_PRECISION", DEFAULT).lower()
    if p not in _VALID:
        raise ValueError(f"DLA_TPU_MATMUL_PRECISION must be one of {_VALID}")
    return p


@contextlib.contextmanager
def override(precision: str | None):
    """Trace-time matmul-precision override (no-op for ``None``).

    Jitted algorithms that take a static ``precision`` argument wrap their
    trace in this, so the jit cache keys on the precision actually used.
    """
    global _override
    if precision is None:
        yield
        return
    p = precision.lower()
    if p not in _VALID:
        raise ValueError(f"precision must be one of {_VALID}, got {precision!r}")
    prev = _override
    _override = p
    try:
        yield
    finally:
        _override = prev
