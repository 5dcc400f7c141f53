from dla_tpu.parallel.block_cyclic import (  # noqa: F401
    BlockCyclicLayout,
    from_dense,
    generate_spd_block_cyclic,
    make_mesh,
    to_dense,
)
from dla_tpu.parallel.column_cyclic import (  # noqa: F401
    from_dense_cols,
    make_flat_mesh,
    potrf_column_cyclic_ring,
    to_dense_cols,
)
from dla_tpu.parallel.potrf_dist import potrf_block_cyclic  # noqa: F401
from dla_tpu.parallel.solve_dist import potrs_block_cyclic  # noqa: F401
