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
from dla_tpu.parallel.packed_cyclic import (  # noqa: F401
    pack_cols_packed,
    potrf_packed_cyclic,
    potrf_packed_cyclic_df64,
    resident_elems,
    unpack_cols_packed,
)
from dla_tpu.parallel.model import (  # noqa: F401
    CHIPS,
    crossover_n,
    project,
    single_chip_rate,
)
from dla_tpu.parallel.serving import (  # noqa: F401
    make_serving_mesh,
    project_serving,
    serving_comm_elems,
    solve_inverse_sharded,
)
from dla_tpu.parallel.potrf_dist import (  # noqa: F401
    flop_accounting,
    flop_accounting_super,
    potrf_block_cyclic,
)
from dla_tpu.parallel.solve_dist import potrs_block_cyclic  # noqa: F401
