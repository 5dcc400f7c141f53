from dla_tpu.validate.residual import (  # noqa: F401
    PASS_THRESHOLD,
    cholesky_invariants,
    freivalds_device,
    residual_posv,
    residual_potrf,
)
