from .mesh import batch_sharding, make_mesh, replicate_sharding, shard_batch  # noqa: F401
