"""LAPACK/BLAS-like primitive ops (single-array level).

These are the TPU-native equivalents of the Chameleon routine surface the
reference programs against (SURVEY §1 L2): ``dplgsy``, ``dlange``, ``dlacpy``,
``dlauum``, ``dgeadd``, ``dgemm``, ``dsyrk``, ``dtrsm``, plus the unblocked
in-register Cholesky used inside tile kernels.
"""

from dla_tpu.ops.lapack_like import (  # noqa: F401
    geadd,
    lacpy,
    lange,
    lauum,
    plgsy,
    plghe,
    plghe_tile,
    plgsy_tile,
    potrf_unblocked,
    spd_gershgorin,
    trtri_lower,
)
from dla_tpu.ops.blas import gemm, syrk, trsm  # noqa: F401
from dla_tpu.ops.df64 import (  # noqa: F401
    df64_matmul_nt,
    from_df64,
    to_df64,
)
