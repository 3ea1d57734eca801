from spartan_tpu.parallel.mesh import SHARD_AXIS, make_mesh, replicate, shard_table
from spartan_tpu.parallel.msm_sharded import msm_sharded
from spartan_tpu.parallel.sumcheck_sharded import (
    from_strided,
    make_cubic_round,
    psum_field,
    to_strided,
)

__all__ = [
    "SHARD_AXIS",
    "make_mesh",
    "replicate",
    "shard_table",
    "msm_sharded",
    "make_cubic_round",
    "to_strided",
    "from_strided",
    "psum_field",
]
