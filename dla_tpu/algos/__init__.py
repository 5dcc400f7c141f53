from dla_tpu.algos.potrf import potrf, potrf_blocked, potrf_masked  # noqa: F401
from dla_tpu.algos.solve import posv, posv_refined, potrs  # noqa: F401
