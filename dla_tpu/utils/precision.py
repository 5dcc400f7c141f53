"""Matmul precision policy.

On TPU, fp32 ``dot`` defaults to a single bf16 MXU pass (~2e-3 relative
error) — unacceptable for a linear-algebra library claiming fp32 results.
The library default is therefore ``"highest"`` (true fp32 accumulation;
measured 6 MXU passes on v5e → ~1/6 of bf16 peak), overridable globally via
the ``DLA_TPU_MATMUL_PRECISION`` env var for throughput experiments:

- ``default``  — 1 bf16 pass, ~full MXU peak, residual ~N·2e-3-grade
- ``high``     — 3-pass bf16x3, ~1/3 peak, near-fp32 residual (the tier the
  reference's "fp32-effective peak" accounting corresponds to)
- ``highest``/``float32`` — true fp32, ~1/6 peak (measured,
  ``results/micro_r2.jsonl``: 8192³ chain at 59 TF/s high vs 29 TF/s highest)

fp64 paths are unaffected (CPU/x64 computes in real fp64).

Algorithms additionally accept an explicit ``precision=...`` static argument
(threaded via :func:`override`) so a single process can trace the same
program at several precisions — the env var alone cannot retrigger a jit
trace.
"""

from __future__ import annotations

import contextlib
import os

_VALID = ("default", "high", "highest", "float32", "fastest")

_override: str | None = None


def matmul_precision() -> str:
    if _override is not None:
        return _override
    p = os.environ.get("DLA_TPU_MATMUL_PRECISION", "highest").lower()
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
