from dla_tpu.algos.potrf import (  # noqa: F401
    potrf,
    potrf_blocked,
    potrf_masked,
    potrf_shrink,
)
from dla_tpu.algos.solve import posv, posv_refined, potrs  # noqa: F401
