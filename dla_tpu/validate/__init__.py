from dla_tpu.validate.residual import (  # noqa: F401
    PASS_THRESHOLD,
    cholesky_invariants,
    residual_posv,
    residual_potrf,
)
