"""Matmul precision policy.

On TPU, fp32 ``dot`` defaults to a single bf16 MXU pass (~2e-3 relative
error) — unacceptable for a linear-algebra library claiming fp32 results.
The library default is therefore ``"highest"`` (3-pass bf16, true fp32
accuracy at ~1/3 MXU peak), overridable globally via the
``DLA_TPU_MATMUL_PRECISION`` env var (``default`` | ``float32`` |
``highest``) for throughput experiments. fp64 paths are unaffected
(CPU/x64 computes in real fp64).
"""

from __future__ import annotations

import os

_VALID = ("default", "float32", "highest", "fastest")


def matmul_precision() -> str:
    p = os.environ.get("DLA_TPU_MATMUL_PRECISION", "highest").lower()
    if p not in _VALID:
        raise ValueError(f"DLA_TPU_MATMUL_PRECISION must be one of {_VALID}")
    return p
