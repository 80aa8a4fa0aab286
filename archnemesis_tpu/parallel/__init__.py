from archnemesis_tpu.parallel.mesh import (
    make_mesh,
    shard_ktables_by_wave,
    shard_spec,
)

__all__ = ["make_mesh", "shard_ktables_by_wave", "shard_spec"]
