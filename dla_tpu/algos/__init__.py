from dla_tpu.algos.potrf import (  # noqa: F401
    potrf,
    potrf_blocked,
    potrf_inplace,
    potrf_masked,
    potrf_shrink,
)
from dla_tpu.algos.packed import (  # noqa: F401
    lauum_packed,
    pack_tri,
    packed_len,
    plgsy_packed,
    potrf_packed,
    potri_packed,
    potrs_packed,
    solve_inverse_packed,
    trtri_packed,
    unpack_tri,
)
from dla_tpu.algos.potrf_df64 import (  # noqa: F401
    freivalds_potrf_df64,
    potrf_df64,
    potrf_packed_df64,
    potrf_packed_df64_split,
    potrs_df64,
    potrs_packed_df64,
    residual_potrf_df64,
    residual_potrf_df64_blocked,
    trmm_packed_df64,
)
from dla_tpu.algos.potri import (  # noqa: F401
    potri,
    potrf_batched,
    solve_inverse,
)
from dla_tpu.algos.solve import (  # noqa: F401
    posv,
    posv_refined,
    posv_refined_host,
    posv_refined_streamed,
    potrs,
    potrs_batched,
)
