from spartan_tpu.parallel.mesh import (
    SHARD_AXIS,
    gather_table,
    init_distributed,
    make_mesh,
    replicate,
    shard_table,
)
from spartan_tpu.parallel.msm_sharded import commit_rows_sharded, msm_sharded
from spartan_tpu.parallel.sumcheck_sharded import (
    bound_sharded,
    from_strided,
    make_cubic_round,
    psum_field,
    to_strided,
)

__all__ = [
    "SHARD_AXIS",
    "make_mesh",
    "init_distributed",
    "gather_table",
    "replicate",
    "shard_table",
    "msm_sharded",
    "commit_rows_sharded",
    "bound_sharded",
    "make_cubic_round",
    "to_strided",
    "from_strided",
    "psum_field",
]
