"""dla_tpu — a TPU-native tiled dense linear algebra framework.

A ground-up JAX/XLA/Pallas rebuild of the capability surface of
HugoVuach/Dense-linear-app (tiled Cholesky on Chameleon/StarPU + ArmoniK):

- ``dla_tpu.ops``      — LAPACK/BLAS-like primitives (plgsy, lange, lacpy,
                         lauum, geadd, gemm/syrk/trsm tile ops).
- ``dla_tpu.tiles``    — the tile-descriptor / block-cyclic layout layer
                         (the Chameleon ``CHAMELEON_Desc_Create`` parameter
                         surface, re-expressed as a JAX sharding-aware
                         layout object).
- ``dla_tpu.kernels``  — Pallas MXU kernels for the four tile ops
                         (POTRF / TRSM / SYRK / GEMM) and fused variants.
- ``dla_tpu.algos``    — blocked factorization / solve algorithms
                         (potrf, potrs, posv, mixed-precision refinement).
- ``dla_tpu.parallel`` — multi-chip block-cyclic POTRF over a 2D
                         ``jax.sharding.Mesh`` via ``shard_map`` + ICI
                         collectives (replaces the reference's ArmoniK
                         client/worker orchestration).
- ``dla_tpu.validate`` — residual gates and numerical invariants.
- ``dla_tpu.bench``    — benchmark harness with CSV/plot parity to the
                         reference's ``benchmark.c``.
- ``dla_tpu.runtime``  — native (C++) host-staging runtime for the
                         out-of-core configuration.
- ``dla_tpu.cli``      — drivers mirroring the reference's CLIs.

Reference provenance is cited throughout as ``file:line`` relative to the
upstream repo (e.g. ``v6_test.c:60``) so capability parity can be audited.
"""

__version__ = "0.1.0"

from dla_tpu.ops import (  # noqa: F401
    geadd,
    gemm,
    lacpy,
    lange,
    lauum,
    plghe,
    plghe_tile,
    plgsy,
    plgsy_tile,
    potrf_unblocked,
    spd_gershgorin,
    syrk,
    trsm,
)
from dla_tpu.algos import (  # noqa: F401
    pack_tri,
    posv,
    potrf,
    potrf_blocked,
    potrf_masked,
    potrf_packed,
    potri,
    potri_packed,
    potrs,
    potrs_packed,
    solve_inverse,
    solve_inverse_packed,
    unpack_tri,
)
from dla_tpu.validate import (  # noqa: F401
    cholesky_invariants,
    residual_potrf,
)
from dla_tpu.tiles import TileLayout  # noqa: F401
